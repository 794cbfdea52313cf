"""Unit tests for the dense time-series stages (stages/timeseries.py)
and PMI collocation mining (functions/text.py) — the edge behaviors the
sf0.01 oracles don't isolate: locf carry-forward, day-of-week slots,
null passthrough in winsorize, document-boundary bigram exclusion."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from vector_ray.stages.timeseries import burn_rate, gapfill, seasonal_z, winsorize


def _rows(ds):
    return sorted(ds.take_all(), key=lambda r: tuple(str(v) for v in r.values()))


def test_gapfill_constant_and_locf(ray_session):
    # key a: windows 0, 20 observed (gap at 10); key b: window 10 only
    t = pa.table(
        {
            "k": ["a", "a", "b"],
            "window_start": [0.0, 20.0, 10.0],
            "n": [2, 5, 7],
            "level": [1.0, 3.0, 9.0],
        }
    )
    out = gapfill(
        rd.from_arrow(t),
        {
            "key_field": "k",
            "window_field": "window_start",
            "step_secs": 10,
            "fill": {"n": 0},
            "locf": ["level"],
        },
    )
    rows = {(r["k"], r["window_start"]): r for r in out.take_all()}
    # global grid: every key gets windows 0, 10, 20
    assert set(rows) == {(k, w) for k in "ab" for w in (0.0, 10.0, 20.0)}
    assert rows[("a", 10.0)]["n"] == 0  # constant fill
    assert rows[("a", 10.0)]["level"] == 1.0  # locf carries 0 -> 10
    assert rows[("a", 20.0)]["level"] == 3.0  # observed beats locf
    assert rows[("b", 0.0)]["level"] is None  # locf before first obs
    assert rows[("b", 0.0)]["n"] == 0
    assert rows[("b", 20.0)]["level"] == 9.0


def test_gapfill_no_key_and_empty(ray_session):
    t = pa.table({"window_start": [0.0, 30.0], "n": [1, 4]})
    out = gapfill(
        rd.from_arrow(t),
        {"window_field": "window_start", "step_secs": 10, "fill": {"n": 0}},
    )
    rows = sorted(out.take_all(), key=lambda r: r["window_start"])
    assert [r["window_start"] for r in rows] == [0.0, 10.0, 20.0, 30.0]
    assert [r["n"] for r in rows] == [1, 0, 0, 4]
    assert all("__g" not in r for r in rows)

    empty = rd.from_arrow(t.slice(0, 0))
    assert (
        gapfill(
            empty,
            {"window_field": "window_start", "step_secs": 10},
        ).count()
        == 0
    )


def test_seasonal_z_day_of_week(ray_session):
    # 1970-01-01 was a Thursday: epoch day 0 -> slot 3 (0 = Monday)
    import pandas as pd

    ts = pd.to_datetime(
        [0, 86400 * 4, 86400 * 7], unit="s"
    )  # Thu, Mon, Thu
    t = pa.table({"ts": pa.array(ts), "k": ["x", "x", "x"]})
    out = seasonal_z(
        rd.from_arrow(t),
        {
            "ts_field": "ts",
            "key_field": "k",
            "window_secs": 86400.0,
            "season": "day_of_week",
            "round": 4,
        },
    )
    rows = {r["window_start"]: r for r in out.take_all()}
    assert len(rows) == 8  # dense: days 0..7
    # the two Thursdays both have n=1 -> zero variance slot -> z null
    assert rows[0.0]["n"] == 1 and rows[0.0]["z"] is None
    # Friday..Sunday slots are all-zero -> z null; Monday day 4 n=1
    assert rows[86400.0 * 4]["n"] == 1


def test_seasonal_z_bad_season(ray_session):
    t = pa.table({"ts": pa.array([0.0]), "k": ["x"]})
    with pytest.raises(ValueError, match="season"):
        seasonal_z(rd.from_arrow(t), {"key_field": "k", "season": "nope"})


def test_burn_rate_null_when_long_rate_zero(ray_session):
    import pandas as pd

    # long window 0: no errors at all -> burn null; window 86400: 1h of
    # 50% errors inside a 25% long rate -> burn 2.0
    ts = pd.to_datetime([10, 20, 86410, 86420, 90010, 90020], unit="s")
    err = [False, False, True, False, False, False]
    t = pa.table({"ts": pa.array(ts), "is_err": err})
    out = burn_rate(
        rd.from_arrow(t),
        {"ts_field": "ts", "error_field": "is_err", "short_secs": 3600,
         "long_secs": 86400},
    )
    rows = {(r["window_long"], r["window_short"]): r for r in out.take_all()}
    assert rows[(0.0, 0.0)]["burn"] is None
    assert rows[(86400.0, 86400.0)]["burn"] == 2.0
    assert rows[(86400.0, 90000.0)]["burn"] == 0.0
    with pytest.raises(ValueError, match="multiple"):
        burn_rate(
            rd.from_arrow(t),
            {"error_field": "is_err", "short_secs": 7.0, "long_secs": 10.0},
        )


def test_winsorize_nulls_pass_through(ray_session):
    t = pa.table({"v": pa.array([1.0, None, 100.0, 2.0, 3.0], pa.float64())})
    out = winsorize(
        rd.from_arrow(t), {"field": "v", "lo": 0.0, "hi": 0.5, "target": "w"}
    )
    rows = out.take_all()
    got = {r["v"]: r["w"] for r in rows}
    assert got[None] is None  # null stays null, not clipped
    assert got[1.0] == 1.0
    # hi = median of non-null [1,2,3,100] = 2.5 -> 100 clips to 2.5
    assert got[100.0] == 2.5


def test_pmi_bigrams_document_boundary(ray_session):
    # 'b a' would be a bigram only if pairs crossed the doc boundary
    docs = pa.table({"text": ["a b a b a b", "a b a b a b a b"]})
    out = (
        __import__("vector_ray.functions.text", fromlist=["pmi_bigrams"])
        .pmi_bigrams(rd.from_arrow(docs), field="text", min_count=2, k=10)
        .take_all()
    )
    pairs = {(r["w1"], r["w2"]): r["c"] for r in out}
    assert pairs[("a", "b")] == 7  # within-doc only: 3 + 4
    assert pairs[("b", "a")] == 5  # within-doc only: 2 + 3
    # the cross-doc boundary pair ('b', 'a') would have made it 6


def test_ols_trend_closed_form(ray_session):
    """Per-key OLS slope/intercept/r2 match numpy.polyfit on a known
    two-key fixture; degenerate keys (n=1, zero x-variance) emit nulls;
    result is invariant to repartitioning."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.grouped import ols_trend

    rng = np.random.RandomState(7)
    xa = np.linspace(0.0, 10.0, 40)
    ya = 2.5 * xa - 1.0 + rng.normal(0, 0.3, 40)
    xb = np.linspace(0.0, 5.0, 25)
    yb = -0.7 * xb + 4.0 + rng.normal(0, 0.1, 25)
    t = pa.table({
        "k": pa.array(["a"] * 40 + ["b"] * 25 + ["one", "flat", "flat"]),
        "x": pa.array(np.concatenate([xa, xb, [1.0, 3.0, 3.0]])),
        "y": pa.array(np.concatenate([ya, yb, [5.0, 1.0, 2.0]])),
    })
    for nparts in (1, 5):
        out = ols_trend(
            rd.from_arrow(t).repartition(nparts),
            {"group_by": "k", "x_field": "x", "y_field": "y", "round": 6},
        ).take_all()
        rows = {r["k"]: r for r in out}
        assert set(rows) == {"a", "b", "one", "flat"}
        for key, x, y in (("a", xa, ya), ("b", xb, yb)):
            slope, intercept = np.polyfit(x, y, 1)
            r = np.corrcoef(x, y)[0, 1]
            assert abs(rows[key]["slope"] - slope) < 1e-5
            assert abs(rows[key]["intercept"] - intercept) < 1e-5
            assert abs(rows[key]["r2"] - r * r) < 1e-5
            assert rows[key]["n"] == len(x)
        for key in ("one", "flat"):
            assert rows[key]["slope"] is None
            assert rows[key]["intercept"] is None
            assert rows[key]["r2"] is None


def test_cooccurrence_supports(ray_session):
    """Pair supports count ENTITIES (not event rows), pairs are
    lexicographically ordered, min_support filters."""
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.grouped import cooccurrence

    rows = [
        (1, "a"), (1, "a"), (1, "b"),          # u1: {a,b}
        (2, "b"), (2, "a"), (2, "c"),          # u2: {a,b,c}
        (3, "a"), (3, "b"),                    # u3: {a,b}
        (4, "c"),                              # u4: singleton -> no pairs
        (5, None), (5, "a"),                   # nulls ignored
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
    })
    out = cooccurrence(
        rd.from_arrow(t).repartition(3),
        {"entity": "user_id", "state_field": "event_type"},
    ).take_all()
    got = {(r["state_a"], r["state_b"]): r["n"] for r in out}
    assert got == {("a", "b"): 3, ("a", "c"): 1, ("b", "c"): 1}
    out2 = cooccurrence(
        rd.from_arrow(t),
        {"entity": "user_id", "state_field": "event_type", "min_support": 2},
    ).take_all()
    assert {(r["state_a"], r["state_b"]): r["n"] for r in out2} == {("a", "b"): 3}
