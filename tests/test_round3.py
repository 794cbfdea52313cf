"""Round-3 per-key operator tests: Holt linear smoothing, lag-k
autocorrelation, SCD2 history build, and golden-record survivorship —
each checked against an independent per-row reference (pandas / hand
recurrence), plus null and empty-input behavior.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd


def _collect(ds) -> pa.Table:
    tables = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables, promote_options="default") if tables else pa.table({})


def _round9(x):
    from vector_ray.schema import round_sql_np

    return float(round_sql_np(np.array([x]), 9)[0])


# ---------------------------------------------------------------------------
# holt
# ---------------------------------------------------------------------------


def test_holt_matches_hand_recurrence(ray_session):
    from vector_ray.stages import grouped

    rng = np.random.default_rng(7)
    ks, ts, xs = [], [], []
    for k in range(12):
        n = int(rng.integers(1, 40))
        ks += [k] * n
        ts += list(range(n))
        xs += list(np.round(rng.normal(50, 10, n), 3))
    ds = rd.from_arrow(
        pa.table({"k": pa.array(ks, pa.int64()), "t": pa.array(ts, pa.int64()),
                  "x": pa.array(xs, pa.float64())})
    ).repartition(5)
    out = _collect(
        grouped.holt(
            ds,
            {"group_by": "k", "order_by": ["t"], "field": "x",
             "alpha": 0.3, "beta": 0.2, "num_buckets": 4},
        )
    ).to_pandas().sort_values(["k", "t"]).reset_index(drop=True)

    import pandas as pd

    ref = pd.DataFrame({"k": ks, "t": ts, "x": xs}).sort_values(["k", "t"])
    for k, g in ref.groupby("k"):
        l = b = None
        for _, row in g.iterrows():
            if l is None:
                l, b = _round9(row.x), 0.0
            else:
                nl = _round9(0.3 * row.x + 0.7 * (l + b))
                b = _round9(0.2 * (nl - l) + 0.8 * b)
                l = nl
            got = out[(out.k == k) & (out.t == row.t)].iloc[0]
            assert got.holt_level_x == pytest.approx(l, abs=0), (k, row.t)
            assert got.holt_trend_x == pytest.approx(b, abs=0), (k, row.t)


def test_holt_null_poisons_tail(ray_session):
    from vector_ray.stages import grouped

    ds = rd.from_arrow(
        pa.table({"k": [1, 1, 1], "t": [0, 1, 2],
                  "x": pa.array([5.0, None, 7.0], pa.float64())})
    )
    out = _collect(
        grouped.holt(ds, {"group_by": "k", "order_by": ["t"], "field": "x",
                          "num_buckets": 2})
    ).to_pandas().sort_values("t")
    assert out.holt_level_x.tolist()[0] == 5.0
    assert np.isnan(out.holt_level_x.tolist()[1])
    assert np.isnan(out.holt_level_x.tolist()[2])  # poisoned tail
    assert np.isnan(out.holt_trend_x.tolist()[2])


# ---------------------------------------------------------------------------
# autocorr
# ---------------------------------------------------------------------------


def test_autocorr_matches_numpy(ray_session):
    from vector_ray.stages import grouped

    rng = np.random.default_rng(11)
    ks, ts, xs = [], [], []
    for k in ("a", "b", "c"):
        n = 200
        base = rng.normal(0, 1, n)
        # give 'b' strong lag-1 structure
        if k == "b":
            base = np.cumsum(base)
        ks += [k] * n
        ts += list(range(n))
        xs += list(np.round(base, 4))
    ds = rd.from_arrow(
        pa.table({"k": ks, "t": pa.array(ts, pa.int64()),
                  "x": pa.array(xs, pa.float64())})
    ).repartition(6)
    out = _collect(
        grouped.autocorr(
            ds, {"group_by": "k", "order_by": ["t"], "field": "x",
                 "lag": 2, "round": 6}
        )
    ).to_pandas().set_index("k")
    for k in ("a", "b", "c"):
        sel = [x for kk, x in zip(ks, xs) if kk == k]
        a = np.asarray(sel)
        r_ref = np.corrcoef(a[2:], a[:-2])[0, 1]
        assert out.loc[k, "n_pairs"] == len(a) - 2
        assert out.loc[k, "acf"] == pytest.approx(r_ref, abs=1e-6)
    assert out.loc["b", "acf"] > 0.9  # random walk: strong autocorrelation


def test_autocorr_short_and_null_keys(ray_session):
    from vector_ray.stages import grouped

    ds = rd.from_arrow(
        pa.table({
            "k": ["s", "n", "n", "n", "c", "c", "c"],
            "t": pa.array([0, 0, 1, 2, 0, 1, 2], pa.int64()),
            "x": pa.array([1.0, 1.0, None, 3.0, 2.0, 2.0, 2.0], pa.float64()),
        })
    )
    out = _collect(
        grouped.autocorr(
            ds, {"group_by": "k", "order_by": ["t"], "field": "x", "lag": 1}
        )
    ).to_pandas().set_index("k")
    assert out.loc["s", "n_pairs"] == 0 and np.isnan(out.loc["s", "acf"])
    # 'n': pairs (1,None) and (None,3) both dropped
    assert out.loc["n", "n_pairs"] == 0
    # 'c': constant -> zero variance -> NULL acf, pairs still counted
    assert out.loc["c", "n_pairs"] == 2 and np.isnan(out.loc["c", "acf"])


# ---------------------------------------------------------------------------
# scd2
# ---------------------------------------------------------------------------


def test_scd2_runs_and_intervals(ray_session):
    from vector_ray.stages import grouped

    ds = rd.from_arrow(
        pa.table({
            "k": [1, 1, 1, 1, 1, 2, 2],
            "t": pa.array([10, 20, 30, 40, 50, 5, 6], pa.int64()),
            "id": pa.array(list(range(7)), pa.int64()),
            "attr": ["x", "x", "y", "y", "x", None, None],
        })
    ).repartition(3)
    out = _collect(
        grouped.scd2(
            ds, {"group_by": "k", "order_by": ["t", "id"],
                 "attrs": ["attr"], "ts_field": "t"}
        )
    ).to_pandas().sort_values(["k", "valid_from"]).reset_index(drop=True)
    k1 = out[out.k == 1]
    assert k1.attr.tolist() == ["x", "y", "x"]
    assert k1.valid_from.tolist() == [10, 30, 50]
    assert k1.valid_to.tolist()[:2] == [30, 50]
    assert np.isnan(k1.valid_to.tolist()[2])
    assert k1.is_current.tolist() == [0, 0, 1]
    # null attrs compare null-safely: one single run for k=2
    k2 = out[out.k == 2]
    assert len(k2) == 1 and k2.iloc[0].is_current == 1
    assert k2.iloc[0].valid_from == 5


# ---------------------------------------------------------------------------
# survivorship
# ---------------------------------------------------------------------------


def test_survivorship_latest_non_null_per_field(ray_session):
    from vector_ray.stages import grouped

    ds = rd.from_arrow(
        pa.table({
            "k": [1, 1, 1, 2, 2],
            "t": pa.array([1, 2, 3, 1, 2], pa.int64()),
            "a": ["old", "new", None, None, None],
            "v": pa.array([10.0, None, 30.0, None, None], pa.float64()),
        })
    ).repartition(2)
    out = _collect(
        grouped.survivorship(
            ds, {"group_by": "k", "order_by": ["t"], "fields": ["a", "v"]}
        )
    ).to_pandas().set_index("k")
    # k=1: latest non-null a is at t=2 ('new'), latest non-null v at t=3
    assert out.loc[1, "last_a"] == "new"
    assert out.loc[1, "last_v"] == 30.0
    assert out.loc[1, "n_rows"] == 3
    # k=2: all null -> stays null
    assert out.loc[2, "last_a"] is None or (
        isinstance(out.loc[2, "last_a"], float) and np.isnan(out.loc[2, "last_a"])
    )
    assert np.isnan(out.loc[2, "last_v"])
