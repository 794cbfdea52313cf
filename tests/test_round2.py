"""Round-2 feature tests: quantile/count_distinct aggregation, reduce
ends_when, route mode='all', Ray-native tag_cardinality_limit, two-phase
throttle under skew, exact vs LSH embedding dup pairs, CSV enrichment,
VRL timestamps / truncated %% / ordering coercion, bucketed_join key
dtype validation, and hot-bucket capped vectorized pair generation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray
import ray.data as rd


def _collect(ds) -> pa.Table:
    tables = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables, promote_options="default") if tables else pa.table({})


# ---------------------------------------------------------------------------
# aggregate: quantiles + count_distinct
# ---------------------------------------------------------------------------


def test_aggregate_quantiles_and_count_distinct(ray_session):
    from vector_ray.stages import grouped

    rng = np.random.default_rng(5)
    n = 4000
    keys = rng.choice(["a", "b"], size=n)
    vals = np.round(rng.normal(100, 25, n), 3)
    users = rng.integers(0, 97, n)
    ds = rd.from_arrow(
        pa.table({"k": keys, "v": vals, "u": users})
    ).repartition(7)
    out = _collect(
        grouped.aggregate(
            ds,
            {
                "group_by": ["k"],
                "aggregates": {
                    "p50": {"fn": "p50", "field": "v"},
                    "p99": {"fn": "p99", "field": "v"},
                    "qq": {"fn": "quantile", "field": "v", "q": 0.25},
                    "nu": {"fn": "count_distinct", "field": "u"},
                    "n": {"fn": "count"},
                },
                "round": 4,
            },
        )
    ).sort_by([("k", "ascending")])
    for i, k in enumerate(out["k"].to_pylist()):
        sel = vals[keys == k]
        assert out["p50"][i].as_py() == pytest.approx(np.quantile(sel, 0.5), abs=1e-4)
        assert out["p99"][i].as_py() == pytest.approx(np.quantile(sel, 0.99), abs=1e-4)
        assert out["qq"][i].as_py() == pytest.approx(np.quantile(sel, 0.25), abs=1e-4)
        assert out["nu"][i].as_py() == len(np.unique(users[keys == k]))
        assert out["n"][i].as_py() == int((keys == k).sum())


# ---------------------------------------------------------------------------
# reduce ends_when
# ---------------------------------------------------------------------------


def test_reduce_ends_when_window_close(ray_session):
    from vector_ray.stages import grouped

    # user 1: e e END e END e  -> windows [0..2], [3..4], [5]
    t = pa.table(
        {
            "user": [1, 1, 1, 1, 1, 1, 2],
            "seq": [0, 1, 2, 3, 4, 5, 0],
            "kind": ["e", "e", "end", "e", "end", "e", "e"],
        }
    )
    out = _collect(
        grouped.reduce_(
            rd.from_arrow(t),
            {
                "group_by": ["user"],
                "ends_when": '.kind == "end"',
                "order_by": ["seq"],
                "merge_strategies": {"seq": "min", "kind": "drop"},
                "count_field": "n",
            },
        )
    ).sort_by([("user", "ascending"), ("wid", "ascending")])
    rows = out.to_pylist()
    assert [(r["user"], r["wid"], r["seq"], r["n"]) for r in rows] == [
        (1, 0, 0, 3),
        (1, 1, 3, 2),
        (1, 2, 5, 1),
        (2, 0, 0, 1),
    ]


# ---------------------------------------------------------------------------
# route mode='all' (multi-output delivery)
# ---------------------------------------------------------------------------


def test_route_all_delivers_to_every_match(ray_session):
    from vector_ray.stages import core

    t = pa.table({"x": [1, 60, 120], "kind": ["p", "q", "p"]})
    ds = core.route(
        rd.from_arrow(t),
        {"route": {"big": ".x >= 50", "ps": '.kind == "p"'}, "mode": "all"},
    )
    out = _collect(ds).sort_by([("x", "ascending"), (core.ROUTE_COLUMN, "ascending")])
    got = list(zip(out["x"].to_pylist(), out[core.ROUTE_COLUMN].to_pylist()))
    # x=1: only ps; x=60: only big; x=120: BOTH copies
    assert got == [(1, "ps"), (60, "big"), (120, "big"), (120, "ps")]

    # exclusive mode keeps exactly one label per row (first match wins)
    ds2 = core.route(
        rd.from_arrow(t),
        {"route": {"big": ".x >= 50", "ps": '.kind == "p"'}},
    )
    out2 = _collect(ds2).sort_by([("x", "ascending")])
    assert out2[core.ROUTE_COLUMN].to_pylist() == ["ps", "big", "big"]


# ---------------------------------------------------------------------------
# tag_cardinality_limit: never materializes distinct values on the driver
# ---------------------------------------------------------------------------


def test_tag_cardinality_limit_high_cardinality_no_driver_pandas(
    ray_session, monkeypatch
):
    from vector_ray.stages import metricops

    def _boom(self, *a, **k):
        raise AssertionError("tag_cardinality_limit must not call to_pandas")

    monkeypatch.setattr(rd.Dataset, "to_pandas", _boom)
    n = 100_000
    # one hot value, the rest unique — 99,902 distinct values
    tags = np.where(
        np.arange(n) % 100 < 2, "hot", np.char.add("v", np.arange(n).astype(str))
    )
    ds = rd.from_arrow(pa.table({"tag": tags, "i": np.arange(n)})).repartition(8)
    out = _collect(
        metricops.tag_cardinality_limit(
            ds, {"fields": ["tag"], "value_limit": 1, "limit_exceeded_action": "drop_event"}
        )
    )
    assert set(out["tag"].to_pylist()) == {"hot"}
    assert out.num_rows == 2000


# ---------------------------------------------------------------------------
# throttle: two-phase prune correctness under heavy key skew
# ---------------------------------------------------------------------------


def test_throttle_skewed_key_two_phase(ray_session):
    from vector_ray.stages import grouped

    rng = np.random.default_rng(9)
    n = 20_000
    # zipf-ish: 90% of rows on one key
    keys = np.where(rng.random(n) < 0.9, "hot", rng.choice(["a", "b", "c"], n))
    ts = rng.integers(0, 10_000, n)
    ids = np.arange(n)
    ds = rd.from_arrow(pa.table({"k": keys, "ts": ts, "id": ids})).repartition(16)
    out = _collect(
        grouped.throttle(
            ds,
            {
                "threshold": 3,
                "window_secs": 1000,
                "key_field": "k",
                "ts_field": "ts",
                "order_by": ["ts", "id"],
            },
        )
    )
    # reference: pandas rank-within-group
    import pandas as pd

    df = pd.DataFrame({"k": keys, "ts": ts, "id": ids})
    df["w"] = df.ts // 1000
    df = df.sort_values(["ts", "id"])
    df["rn"] = df.groupby(["k", "w"]).cumcount()
    expect = df[df.rn < 3]
    got = out.to_pandas().sort_values(["k", "ts", "id"]).reset_index(drop=True)
    exp = expect[["k", "ts", "id"]].sort_values(["k", "ts", "id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "ts", "id"]], exp)


# ---------------------------------------------------------------------------
# embedding dup pairs: exact block-pair vs brute force; LSH subset/recall
# ---------------------------------------------------------------------------


def _brute_pairs(ids, mat, threshold):
    from vector_ray.schema import round_sql_np

    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = round_sql_np(round_sql_np(norm @ norm.T, 9), 6)
    out = set()
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            if sims[x, y] >= threshold:
                out.add((min(ids[x], ids[y]), max(ids[x], ids[y])))
    return out


def test_embedding_dup_pairs_exact_matches_bruteforce(ray_session):
    rng = np.random.default_rng(3)
    n, dim = 300, 16
    mat = rng.standard_normal((n, dim))
    # plant near-dups
    for i in range(0, 30, 2):
        mat[i + 1] = mat[i] + rng.normal(0, 0.01, dim)
    ids = np.arange(n)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.astype(np.float32).reshape(-1), pa.float32()), dim
            ),
        }
    )
    from vector_ray.functions.dedup import embedding_dup_pairs, embedding_dup_pairs_lsh

    mat32 = mat.astype(np.float32).astype(np.float64)
    expect = _brute_pairs(ids, mat32, 0.95)
    assert len(expect) >= 15
    ds = rd.from_arrow(tbl).repartition(5)
    got_tbl = _collect(embedding_dup_pairs(ds, threshold=0.95, num_buckets=4))
    got = set(zip(got_tbl["doc_a"].to_pylist(), got_tbl["doc_b"].to_pylist()))
    assert got == expect

    # LSH variant: a subset of the exact pairs, with high recall on
    # planted near-identical duplicates
    lsh_tbl = _collect(embedding_dup_pairs_lsh(ds, threshold=0.95, bands=8, n_planes=6))
    lsh = set(zip(lsh_tbl["doc_a"].to_pylist(), lsh_tbl["doc_b"].to_pylist()))
    assert lsh <= expect
    assert len(lsh) >= 0.8 * len(expect)


# ---------------------------------------------------------------------------
# hot-bucket cap: 5k identical docs do not explode pair generation
# ---------------------------------------------------------------------------


def test_minhash_hot_bucket_capped(ray_session):
    from vector_ray.functions import dedup

    n = 5000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(["all work and no play makes jack a dull boy"] * n),
        }
    )
    ds = rd.from_arrow(t)
    # small explicit cap: the capping logic and the vectorized pair path
    # are identical at any cap value, and the default (2048) would make
    # this stress test generate 33M candidate rows — minutes, not seconds
    cap = 256
    out = _collect(
        dedup.minhash_lsh_candidates(ds, threshold=0.5, max_bucket_rows=cap)
    )
    # every surviving pair involves only the first `cap` ids per bucket,
    # and the pair count is bounded by cap^2/2, not n^2/2
    assert out.num_rows == cap * (cap - 1) // 2
    assert pc.max(out["doc_b"]).as_py() < cap


# ---------------------------------------------------------------------------
# CSV enrichment
# ---------------------------------------------------------------------------


def test_enrich_from_csv(ray_session, tmp_path):
    from vector_ray.stages.enrich import enrich

    csv = tmp_path / "lookup.csv"
    csv.write_text("key,grp\n1,alpha\n2,beta\n")
    ds = rd.from_arrow(pa.table({"key": pa.array([1, 2, 3], pa.int32())}))
    out = _collect(enrich(ds, {"table": str(csv), "key": "key"})).sort_by(
        [("key", "ascending")]
    )
    assert out["grp"].to_pylist() == ["alpha", "beta", None]


# ---------------------------------------------------------------------------
# VRL: timestamps, truncated %, ordering coercion
# ---------------------------------------------------------------------------


def test_vrl_timestamp_roundtrip():
    from vector_ray.vrl import compile_expr

    t = pa.table(
        {"ts": pa.array([1704067207_000000, 1704070000_000000], pa.timestamp("us"))}
    )
    day = compile_expr('format_timestamp(.ts, "%Y-%m-%d")')(t)
    assert day.to_pylist() == ["2024-01-01", "2024-01-01"]
    rt = compile_expr(
        'parse_timestamp(format_timestamp(.ts, "%Y-%m-%d %H:%M:%S"), "%Y-%m-%d %H:%M:%S")'
    )(t)
    assert rt.to_pylist()[0].isoformat() == "2024-01-01T00:00:07"
    bad = compile_expr('parse_timestamp(.s, "%Y-%m-%d")')(
        pa.table({"s": ["2024-01-01", "nope"]})
    )
    assert bad.to_pylist()[1] is None


def test_vrl_mod_truncated_remainder():
    from vector_ray.vrl import compile_expr

    t = pa.table({"a": pa.array([-7.0, 7.0, -7.5]), "b": pa.array([-7, 7, 5])})
    out = compile_expr(".a % 3")(t)
    assert out.to_pylist() == [-1.0, 1.0, -1.5]  # DuckDB: SELECT -7.5 % 3 = -1.5
    out_i = compile_expr(".b % 3")(t)
    assert out_i.to_pylist() == [-1, 1, 2]


def test_vrl_ordering_coerces_numeric_literal():
    from vector_ray.vrl import compile_predicate, VrlError

    t = pa.table({"status": pa.array([50, 1000, 400])})
    mask = compile_predicate('.status >= "400"')(t)
    assert mask.to_pylist() == [False, True, True]  # numeric, not lexicographic
    with pytest.raises(VrlError):
        compile_predicate('.status >= "abc"')(t)
    # equality keeps string-cast semantics
    eq = compile_predicate('.status == "400"')(t)
    assert eq.to_pylist() == [False, False, True]


# ---------------------------------------------------------------------------
# bucketed_join key dtype validation
# ---------------------------------------------------------------------------


def test_bucketed_join_key_dtype_mismatch_raises(ray_session):
    from vector_ray.stages.shuffle import bucketed_join

    l = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int32()), "a": [1, 2]}))
    r = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()), "b": [3, 4]}))
    with pytest.raises(TypeError, match="dtype mismatch"):
        bucketed_join(l, r, "k")


# ---------------------------------------------------------------------------
# distributed connected components (contraction, no driver-side label map)
# ---------------------------------------------------------------------------


def test_connected_components_distributed_chain_100k(ray_session):
    from vector_ray.functions.dedup import connected_components_distributed

    n = 100_000
    a = np.arange(n, dtype=np.int64)
    pairs = rd.from_arrow(
        pa.table({"doc_a": pa.array(a), "doc_b": pa.array(a + 1)})
    ).repartition(16)
    out = _collect(connected_components_distributed(pairs, num_buckets=16))
    assert out.num_rows == n + 1
    assert pc.min(out["cluster"]).as_py() == 0
    assert pc.max(out["cluster"]).as_py() == 0  # one component, min id 0


def test_connected_components_distributed_multiround_matches_local(ray_session):
    from vector_ray.functions.dedup import (
        _local_union_find,
        connected_components_distributed,
    )

    rng = np.random.default_rng(42)
    # permuted chain: no id locality, so the sorted range partition can't
    # collapse it in one round — forces real contraction layers + unwind
    n = 20_000
    perm = rng.permutation(n + 1).astype(np.int64)
    a = np.concatenate([perm[:-1], rng.integers(10**6, 2 * 10**6, 500)])
    b = np.concatenate(
        [perm[1:], a[-500:] + rng.integers(1, 5, 500).astype(np.int64)]
    )
    pairs = rd.from_arrow(
        pa.table({"doc_a": pa.array(a), "doc_b": pa.array(b)})
    ).repartition(8)
    out = _collect(
        connected_components_distributed(
            pairs, num_buckets=8, local_threshold=4_000
        )
    )
    got = dict(zip(out["doc_id"].to_pylist(), out["cluster"].to_pylist()))
    ref = _local_union_find(a, b)
    assert got == ref


# ---------------------------------------------------------------------------
# framing (character/length/octet) + native_json codec
# ---------------------------------------------------------------------------


def test_frame_character_delimited(ray_session):
    from vector_ray.stages.framing import frame

    t = pa.table(
        {
            "src": ["a", "b", "c"],
            "message": ["x\x1ey\x1ez", "only", "end\x1e"],  # trailing delim
        }
    )
    out = _collect(
        frame(rd.from_arrow(t), {"method": "character_delimited", "delimiter": "\x1e"})
    )
    got = sorted(zip(out["src"].to_pylist(), out["message"].to_pylist()))
    assert got == [("a", "x"), ("a", "y"), ("a", "z"), ("b", "only"), ("c", "end")]


def test_frame_length_delimited_and_octet_counting(ray_session):
    from vector_ray.stages.framing import frame

    def ld(*frames):
        return b"".join(len(f).to_bytes(4, "big") + f for f in frames)

    t = pa.table(
        {"i": [1, 2], "message": [ld(b"abc", b"de"), ld(b"xyzzy")]}
    )
    out = _collect(frame(rd.from_arrow(t), {"method": "length_delimited"}))
    got = sorted(zip(out["i"].to_pylist(), out["message"].to_pylist()))
    assert got == [(1, b"abc"), (1, b"de"), (2, b"xyzzy")]

    oc = pa.table({"i": [7], "message": [b"3 abc5 hello"]})
    out2 = _collect(frame(rd.from_arrow(oc), {"method": "octet_counting"}))
    assert out2["message"].to_pylist() == [b"abc", b"hello"]

    from vector_ray.vrl import VrlError

    with pytest.raises((VrlError, Exception)):
        bad = pa.table({"message": [b"\x00\x00\x00\x09ab"]})  # overrun
        _collect(frame(rd.from_arrow(bad), {"method": "length_delimited"}))


def test_parse_native_json_codec(ray_session):
    from vector_ray.stages import core

    lines = [
        '{"log": {"message": "hi", "status": 200}}',
        '{"metric": {"name": "reqs", "counter": {"value": 3.5}}}',
        '{"metric": {"name": "load", "gauge": {"value": 0.7}}}',
        "not json",
    ]
    t = pa.table({"message": lines})
    out = _collect(
        core.remap(
            rd.from_arrow(t),
            {
                "ops": [
                    {
                        "op": "parse_native_json",
                        "field": "message",
                        "keys": ["status"],
                        "types": {"status": "int"},
                    }
                ]
            },
        )
    )
    rows = out.to_pylist()
    assert rows[0]["__kind"] == "log" and rows[0]["status"] == 200
    assert rows[1]["metric_name"] == "reqs" and rows[1]["metric_kind"] == "counter"
    assert rows[1]["metric_value"] == 3.5
    assert rows[2]["metric_kind"] == "gauge" and rows[2]["metric_value"] == 0.7
    assert rows[3]["__kind"] == "log" and rows[3]["status"] is None

    # the protobuf `native` codec is now real (stages/native_codec.py,
    # round-trip coverage in tests/test_native_ivf.py) — it must compile
    fn = core.compile_remap({"ops": [{"op": "parse_native", "field": "message"}]})
    assert callable(fn)


# ---------------------------------------------------------------------------
# histogram bucket counts (count_le) + set metric kind
# ---------------------------------------------------------------------------


def test_aggregate_count_le_buckets(ray_session):
    from vector_ray.stages import grouped

    rng = np.random.default_rng(11)
    vals = rng.uniform(0, 100, 3000)
    keys = rng.choice(["x", "y"], 3000)
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(5)
    out = _collect(
        grouped.aggregate(
            ds,
            {
                "group_by": ["k"],
                "aggregates": {
                    "le_30": {"fn": "count_le", "field": "v", "le": 30.0},
                    "le_60": {"fn": "count_le", "field": "v", "le": 60.0},
                    "p50": {"fn": "p50", "field": "v"},  # mixed with list path
                },
                "round": 4,
            },
        )
    ).sort_by([("k", "ascending")])
    for i, k in enumerate(out["k"].to_pylist()):
        sel = vals[keys == k]
        assert out["le_30"][i].as_py() == int((sel <= 30.0).sum())
        assert out["le_60"][i].as_py() == int((sel <= 60.0).sum())


def test_log_to_metric_set_kind(ray_session):
    from vector_ray.stages import metricops

    t = pa.table({"user": [1, 2, 2, 3], "evt": ["a", "a", "b", "b"]})
    out = _collect(
        metricops.log_to_metric(
            rd.from_arrow(t),
            {
                "metrics": [
                    {
                        "type": "set",
                        "name": "users",
                        "field": "user",
                        "tags": {"evt": ".evt"},
                    }
                ]
            },
        )
    )
    assert out["kind"].to_pylist() == ["set"] * 4
    assert out["set_member"].to_pylist() == ["1", "2", "2", "3"]
    assert all(v is None for v in out["value"].to_pylist())


def test_frame_multiline(ray_session):
    from vector_ray.stages.framing import frame
    from vector_ray.vrl import VrlError

    t = pa.table(
        {
            "src": ["a", "b", "c", "d"],
            "message": [
                # two events, the second with two continuation lines
                "ERR boom\n  at f()\nERR again\n  at g()\n  at h()",
                # leading continuation: first line still opens a group
                "  orphan\nERR x",
                "no match at all\n  cont",
                None,
            ],
        }
    )
    out = _collect(
        frame(
            rd.from_arrow(t),
            {"method": "multiline", "start_pattern": "^ERR"},
        )
    )
    got = sorted(zip(out["src"].to_pylist(), out["message"].to_pylist()))
    assert got == [
        ("a", "ERR again\n  at g()\n  at h()"),
        ("a", "ERR boom\n  at f()"),
        ("b", "  orphan"),
        ("b", "ERR x"),
        ("c", "no match at all\n  cont"),
    ]

    with pytest.raises((VrlError, Exception)):
        frame(rd.from_arrow(t), {"method": "multiline"})


def test_frame_vectorized_matches_per_row_scanners(ray_session):
    """Round-3: the vectorized length-prefixed framers must agree
    byte-for-byte with the per-row reference scanners on randomized
    payloads — zero-length frames, empty/null payloads, and an
    octet-counting frame big enough (8-digit prefix) to route through
    the fallback path."""
    import random

    from vector_ray.stages.framing import (
        _frame_length_delimited_vec,
        _frame_octet_counting_vec,
        _frame_scanned,
        _scan_length_delimited,
        _scan_octet_counting,
    )

    def mk_ld(frames):
        return b"".join(len(f).to_bytes(4, "big") + f for f in frames)

    def mk_oc(frames):
        return b"".join(str(len(f)).encode() + b" " + f for f in frames)

    rng = random.Random(7)
    pl, po = [], []
    for _ in range(800):
        k = rng.randint(0, 5)
        fr = [
            bytes(rng.getrandbits(8) for _ in range(rng.randint(0, 25)))
            for _ in range(k)
        ]
        pl.append(mk_ld(fr))
        po.append(mk_oc(fr))
    pl[17] = None
    po[23] = None
    po[50] = b""
    po[60] = mk_oc([b"a", b"x" * 10_000_000, b"b"])  # fallback row
    tl = pa.table({"i": list(range(800)), "m": pa.array(pl, pa.binary())})
    to = pa.table({"i": list(range(800)), "m": pa.array(po, pa.binary())})
    assert _frame_length_delimited_vec(tl, "m").equals(
        _frame_scanned(tl, "m", _scan_length_delimited)
    )
    assert _frame_octet_counting_vec(to, "m").equals(
        _frame_scanned(to, "m", _scan_octet_counting)
    )
