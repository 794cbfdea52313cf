"""Mergeable sketch aggregates (functions/sketches.py): accuracy
bounds, merge-order invariance, null handling, and the grouped
aggregate integration."""

import numpy as np
import pyarrow as pa
import pytest

from vector_ray.functions.sketches import (
    HLL_M,
    hll_estimate,
    hll_merge,
    hll_registers,
    ll_indices,
    ll_merge,
    ll_quantile,
    ll_value,
)
from vector_ray.stages.core import _stable_hash_u64


def _hashes(values) -> np.ndarray:
    return _stable_hash_u64(pa.array([str(v) for v in values]))


def test_hll_error_bound():
    # 3 sigma of the published 1.04/sqrt(m) standard error
    for n in (100, 5_000, 50_000):
        est = hll_estimate(hll_registers(_hashes(range(n))))
        assert abs(est - n) / n < 3 * 1.04 / np.sqrt(HLL_M), (n, est)


def test_hll_duplicates_do_not_inflate():
    vals = [f"u{i % 500}" for i in range(20_000)]
    est = hll_estimate(hll_registers(_hashes(vals)))
    assert abs(est - 500) / 500 < 0.05


def test_hll_merge_equals_whole():
    """Register-max merge of arbitrary splits == sketch of the union
    (the property that makes the shuffle order irrelevant)."""
    all_vals = [f"k{i}" for i in range(10_000)]
    whole = hll_registers(_hashes(all_vals))
    parts = [
        hll_registers(_hashes(all_vals[i::7])).tobytes() for i in range(7)
    ]
    assert np.array_equal(hll_merge(parts), whole)


def test_ll_quantile_relative_error():
    rng = np.random.default_rng(42)
    vals = np.exp(rng.normal(3, 2, size=20_000))  # heavy-tailed
    u, c = ll_merge(ll_indices(vals), np.ones(len(vals), np.int64))
    for q in (0.5, 0.9, 0.99):
        exact = np.quantile(vals, q, method="lower")
        approx = ll_quantile(u, c, q)
        assert abs(approx - exact) / exact < 2 ** -(7 + 1) + 1e-12, (q, approx, exact)


def test_ll_negative_zero_and_order():
    vals = np.array([-100.0, -1.5, 0.0, 0.0, 2.0, 300.0])
    ix = ll_indices(vals)
    assert (np.diff(ix) >= 0).all()  # index order == value order
    u, c = ll_merge(ix, np.ones(len(vals), np.int64))
    assert ll_quantile(u, c, 0.0) == pytest.approx(-100.0, rel=0.01)
    assert ll_quantile(u, c, 1.0) == pytest.approx(300.0, rel=0.01)
    # rank 2 and 3 are the zeros
    assert ll_quantile(u, c, 0.5) == 0.0


def test_ll_value_roundtrip():
    for v in (1e-300, 0.007, 1.0, 123456.789, 8.8e250):
        for s in (v, -v):
            ix = int(ll_indices(np.array([s]))[0])
            rep = ll_value(ix)
            assert abs(rep - s) / abs(s) <= 2 ** -8, (s, rep)


def test_ll_rejects_non_finite():
    with pytest.raises(ValueError):
        ll_indices(np.array([1.0, np.inf]))


def test_aggregate_sketch_integration(ray_session):
    import ray.data as rd

    from vector_ray.stages.grouped import aggregate

    rng = np.random.default_rng(7)
    n = 30_000
    keys = np.where(rng.random(n) < 0.5, "a", "b")
    users = rng.integers(0, 2_000, size=n)
    vals = rng.gamma(2.0, 10.0, size=n)
    t = pa.table(
        {
            "k": pa.array(keys),
            "user": pa.array(users, pa.int64()),
            "v": pa.array(vals, pa.float64()),
        }
    )
    ds = rd.from_arrow(t).repartition(8)
    out = aggregate(
        ds,
        {
            "group_by": ["k"],
            "aggregates": {
                "nd": {"fn": "approx_count_distinct", "field": "user"},
                "p90": {"fn": "approx_p90", "field": "v"},
                "qq": {"fn": "approx_quantile", "field": "v", "q": 0.5},
            },
        },
    ).to_pandas().set_index("k")
    import pandas as pd

    df = t.to_pandas()
    for k, grp in df.groupby("k"):
        exact_nd = grp.user.nunique()
        assert abs(out.loc[k, "nd"] - exact_nd) / exact_nd < 0.05
        exact_p90 = np.quantile(grp.v, 0.9, method="lower")
        assert abs(out.loc[k, "p90"] - exact_p90) / exact_p90 < 0.01
        exact_med = np.quantile(grp.v, 0.5, method="lower")
        assert abs(out.loc[k, "qq"] - exact_med) / exact_med < 0.01


def test_sketch_via_spec_dag(ray_session):
    """approx_* fns flow through the generic aggregate transform type."""
    from vector_ray import run_pipeline

    rows = [
        {"k": "a", "u": i % 7, "v": float(i + 1)} for i in range(100)
    ]
    out = run_pipeline(
        {
            "sources": {"in": {"type": "inline", "rows": rows}},
            "transforms": {
                "agg": {
                    "type": "aggregate",
                    "inputs": ["in"],
                    "group_by": ["k"],
                    "aggregates": {
                        "nd": {"fn": "approx_count_distinct", "field": "u"},
                        "med": {"fn": "approx_p50", "field": "v"},
                    },
                }
            },
            "sinks": {"out": {"type": "collect", "inputs": ["agg"]}},
        }
    ).sinks["out"]
    row = out.table.to_pylist()[0]
    assert row["nd"] == 7
    assert abs(row["med"] - 50.0) / 50.0 < 0.01


def test_aggregate_sketch_nulls_ignored(ray_session):
    import ray.data as rd

    from vector_ray.stages.grouped import aggregate

    t = pa.table(
        {
            "k": pa.array(["a"] * 6),
            "u": pa.array([1, 1, 2, None, None, 3], pa.int64()),
            "v": pa.array([10.0, None, 20.0, 30.0, None, 40.0]),
        }
    )
    out = aggregate(
        rd.from_arrow(t).repartition(3),
        {
            "group_by": ["k"],
            "aggregates": {
                "nd": {"fn": "approx_count_distinct", "field": "u"},
                "med": {"fn": "approx_p50", "field": "v"},
            },
        },
    ).to_pandas()
    assert out.nd.tolist() == [3]
    # values {10,20,30,40}: rank floor(0.5*3)=1 -> 20 (within bucket error)
    assert abs(out.med[0] - 20.0) / 20.0 < 0.01


def test_partial_shares_sketch_columns_per_field():
    """N sketch aggregates over one column ship ONE partial per
    (kind, field) across the shuffle — p50/p90/p99 of the same field
    must not triple the shuffled state."""
    from vector_ray.stages.grouped import compile_partial_agg

    partial = compile_partial_agg(
        ["k"],
        {
            "p50": {"fn": "approx_p50", "field": "v"},
            "p90": {"fn": "approx_p90", "field": "v"},
            "p99": {"fn": "approx_p99", "field": "v"},
            "nd1": {"fn": "approx_count_distinct", "field": "u"},
            "nd2": {"fn": "approx_count_distinct", "field": "u"},
        },
    )
    t = pa.table(
        {
            "k": pa.array(["a", "a", "b"]),
            "u": pa.array([1, 2, 2], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0]),
        }
    )
    out = partial(t)
    assert sorted(out.column_names) == [
        "__ph_u", "__pi_v", "__pn_v", "k",
    ]
    # the empty-batch path emits the identical schema
    empty = partial(t.slice(0, 0))
    assert sorted(empty.column_names) == sorted(out.column_names)
    assert empty.schema.equals(out.schema)


def test_bloom_no_false_negatives_and_fpr_bound():
    from vector_ray.functions.sketches import bloom_build, bloom_contains

    rng = np.random.default_rng(9)
    members = rng.integers(0, 2**63, size=20_000, dtype=np.uint64)
    m_bits = len(members) * 16  # 16 bits/key, k=8 -> design FPR ~5e-4
    bf = bloom_build(members, m_bits, k=8)
    assert bloom_contains(bf, members, m_bits, k=8).all()
    probe = rng.integers(0, 2**63, size=200_000, dtype=np.uint64)
    outside = probe[~np.isin(probe, members)]
    fpr = bloom_contains(bf, outside, m_bits, k=8).mean()
    assert fpr < 5e-3, fpr  # 10x headroom over the design rate


def test_bloom_empty():
    from vector_ray.functions.sketches import bloom_build, bloom_contains

    bf = bloom_build(np.empty(0, np.uint64), 1024)
    assert not bloom_contains(
        bf, np.array([1, 2, 3], np.uint64), 1024
    ).any()
