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


# ---------------------------------------------------------------------------
# welch_ttest
# ---------------------------------------------------------------------------


def test_welch_ttest_matches_reference(ray_session):
    from vector_ray.stages import grouped

    rng = np.random.default_rng(3)
    n = 3000
    grp = rng.choice(["g1", "g2"], size=n)
    arm = rng.integers(0, 2, n)
    x = np.round(rng.normal(10, 2, n) + arm * 0.5, 4)  # real effect
    ds = rd.from_arrow(
        pa.table({"g": grp, "arm": pa.array(arm, pa.int64()),
                  "x": pa.array(x, pa.float64())})
    ).repartition(7)
    out = _collect(
        grouped.welch_ttest(
            ds, {"group_by": "g", "arm_field": "arm", "field": "x",
                 "round": 6}
        )
    ).to_pandas().set_index("g")
    for g in ("g1", "g2"):
        a = x[(grp == g) & (arm == 0)]
        b = x[(grp == g) & (arm == 1)]
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        t_ref = (a.mean() - b.mean()) / np.sqrt(se2)
        df_ref = se2**2 / (
            (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        assert out.loc[g, "n_a"] == len(a) and out.loc[g, "n_b"] == len(b)
        assert out.loc[g, "t_stat"] == pytest.approx(t_ref, abs=1e-5)
        assert out.loc[g, "df"] == pytest.approx(df_ref, rel=1e-6)
    # the planted +0.5 arm effect must show as a clearly negative t
    assert (out.t_stat < -3).all()


def test_welch_ttest_rejects_three_arms(ray_session):
    from vector_ray.stages import grouped

    ds = rd.from_arrow(
        pa.table({"g": ["a"] * 6, "arm": [0, 0, 1, 1, 2, 2],
                  "x": pa.array([1.0, 2, 3, 4, 5, 6], pa.float64())})
    )
    with pytest.raises(Exception, match="arms"):
        _collect(
            grouped.welch_ttest(
                ds, {"group_by": "g", "arm_field": "arm", "field": "x"}
            )
        )


# ---------------------------------------------------------------------------
# adamic_adar
# ---------------------------------------------------------------------------


def test_adamic_adar_hand_graph(ray_session):
    from vector_ray.functions.graph import adamic_adar

    # square 1-2-3-4-1 plus hub 5 connected to 1,2,3,4.
    # Non-adjacent pairs: (1,3) and (2,4); each shares two square
    # corners plus the hub.
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (5, 1), (5, 2), (5, 3), (5, 4)]
    ds = rd.from_arrow(
        pa.table({
            "src": pa.array([a for a, b in edges], pa.int64()),
            "dst": pa.array([b for a, b in edges], pa.int64()),
        })
    ).repartition(3)
    out = _collect(
        adamic_adar(ds, min_common=2, round_to=6)
    ).to_pandas().sort_values(["node_a", "node_b"]).reset_index(drop=True)
    # deg(1..4) = 3 (two corners + hub), deg(5) = 4
    expect = 2 * (1.0 / np.log(3.0)) + 1.0 / np.log(4.0)
    assert out.node_a.tolist() == [1, 2]
    assert out.node_b.tolist() == [3, 4]
    assert out.n_common.tolist() == [3, 3]
    assert out.score.tolist() == pytest.approx([expect, expect], abs=1e-6)


def test_adamic_adar_max_degree_drops_hub(ray_session):
    from vector_ray.functions.graph import adamic_adar

    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (5, 1), (5, 2), (5, 3), (5, 4)]
    ds = rd.from_arrow(
        pa.table({
            "src": pa.array([a for a, b in edges], pa.int64()),
            "dst": pa.array([b for a, b in edges], pa.int64()),
        })
    )
    out = _collect(
        adamic_adar(ds, min_common=1, max_degree=3, round_to=6)
    ).to_pandas()
    # hub 5 (degree 4) dropped as a center: its wedge weight is gone,
    # every score now comes from degree-3 corners only
    # score is rounded to 6 decimals by round_to
    assert (out.score - 1.0 / np.log(3.0) * out.n_common).abs().max() < 1e-6
