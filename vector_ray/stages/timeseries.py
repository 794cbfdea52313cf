"""Dense time-series operators over windowed aggregates.

The reference's UI charts per-component rates over wall-clock buckets
(ui/src/components/pipeline/view.rs metric panels) — which presumes a
DENSE series: a window with no events is a zero point, not a missing
row. A plain groupby emits only observed (key, window) combos, so these
stages close the gap batch-side:

* ``gapfill`` — densify a (key, window) aggregate onto the full window
  grid between the global min/max window, filling missing rows with
  constants (count→0) and/or carrying the last observation forward
  (gauge→locf). One tiny bounds pass + one shuffle on key; per key the
  fill is a vectorized scatter (no per-window Python).
* ``seasonal_z`` — hour-of-day (or day-of-week) baseline anomaly: the
  z-score of each window's count against the per-(key, season-slot)
  distribution. Composes tumbling windows → gapfill(0) → per-slot
  z-score, so quiet hours count as 0 rather than vanishing — the shape
  every "is tonight's traffic weird for a Tuesday 3am" alert needs.
* ``burn_rate`` — SLO multi-window burn rate (SRE workbook shape): the
  short-window error rate over the enclosing long-window error rate.
  Two-phase aggregate on (long, short); the long-window totals are
  re-reduced from the tiny short-window partials (never a second pass
  over the events) and broadcast.
* ``winsorize`` — clip a value column to global [q_lo, q_hi] quantiles
  (outlier trimming before stats/training). Two-phase exact quantile
  thresholds broadcast once; one vectorized clip pass.

Scale notes (100 TB): every stage aggregates BEFORE it shuffles, so the
exchange carries (keys × windows) rows, not events. gapfill's grid is
keys × windows — the op's own output size; per-key groups are bounded
by the window count, so no group outgrows a worker unless the output
itself would. burn_rate's broadcast is one float per long window
(hours→years stay in KBs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.schema import round_sql_np
from vector_ray.stages.grouped import aggregate as agg_stage


def _chunk(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def _global_bounds(ds, field: str) -> tuple[float, float] | None:
    """Min/max of ``field`` via one streaming partial-reduce pass (one
    2-value row per block to the driver — never the rows)."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        v = pc.cast(t[field], pa.float64())
        return pa.table({
            "lo": pa.array([pc.min(v).as_py()], pa.float64()),
            "hi": pa.array([pc.max(v).as_py()], pa.float64()),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    los = [r["lo"] for r in rows if r["lo"] is not None]
    his = [r["hi"] for r in rows if r["hi"] is not None]
    if not los:
        return None
    return min(los), max(his)


def gapfill(ds, options: dict, ctx=None):
    """Densify a windowed aggregate onto the full window grid.

    {"type": "gapfill", "key_field": "event_type",
     "window_field": "window_start", "step_secs": 3600,
     "fill": {"n": 0},          # constant per missing row
     "locf": ["level"]}          # carry last observation forward

    Input is the OUTPUT of tumbling()/aggregate() — (key, window_start,
    metrics...) with numeric epoch windows that are exact multiples of
    ``step_secs``. Every key receives the GLOBAL [min, max] window range
    (so all series align, like the SQL grid CROSS JOIN); missing rows
    take the ``fill`` constant per column, or the previous observed
    value for ``locf`` columns (null before the first observation).
    Columns in neither list are filled with null.
    """
    key = options.get("key_field")
    wfield = options.get("window_field", "window_start")
    step = float(options["step_secs"])
    fill: dict = options.get("fill") or {}
    locf: list = list(options.get("locf") or [])

    # Input is a windowed AGGREGATE (keys × windows rows — the op's own
    # output size, small by contract). Materialize it so the bounds pass
    # and the densify groupby don't each re-execute the upstream
    # aggregation pipeline over the raw events.
    ds = ds.materialize()
    bounds = _global_bounds(ds, wfield)
    if bounds is None:  # empty input: nothing to densify
        return ds
    lo, hi = bounds
    n_windows = int(round((hi - lo) / step)) + 1

    if key is None:
        ds = ds.map_batches(
            lambda t: t.append_column(
                "__g", pa.array(np.zeros(t.num_rows, np.int8))
            ),
            batch_format="pyarrow",
        )
        group_key = "__g"
    else:
        group_key = key

    def densify(g: pa.Table) -> pa.Table:
        w = np.asarray(pc.cast(_chunk(g[wfield]), pa.float64()))
        idx = np.rint((w - lo) / step).astype(np.int64)
        order = np.argsort(idx, kind="stable")
        idx = idx[order]
        grid = lo + step * np.arange(n_windows, dtype=np.float64)
        present = np.zeros(n_windows, dtype=bool)
        present[idx] = True
        cols: dict[str, pa.Array] = {}
        if key is not None:
            kv = g[key][0]
            cols[key] = pa.array(
                [kv.as_py()] * n_windows, g.schema.field(key).type
            )
        cols[wfield] = pa.array(grid, pa.float64())
        for name in g.column_names:
            if name in (key, wfield, "__g"):
                continue
            typ = g.schema.field(name).type
            src = _chunk(g[name]).take(pa.array(order))
            # scatter observed values onto the grid, null elsewhere
            gather = np.full(n_windows, -1, dtype=np.int64)
            gather[idx] = np.arange(len(idx))
            if name in locf:
                # forward-fill: each slot takes the latest observed row
                # at-or-before it (running max of the scatter index)
                gather = np.maximum.accumulate(gather)
            dense = src.take(
                pa.array(np.where(gather >= 0, gather, 0), pa.int64())
            )
            if name in locf:
                valid = gather >= 0
            else:
                valid = present
            dense = pc.if_else(pa.array(valid), dense, pa.scalar(None, typ))
            if name in fill and name not in locf:
                dense = pc.fill_null(dense, pa.scalar(fill[name], typ))
            cols[name] = _chunk(dense)
        return pa.table(cols)

    out = ds.groupby(group_key).map_groups(densify, batch_format="pyarrow")
    if key is None:
        out = out.map_batches(
            lambda t: t.drop_columns(["__g"]) if "__g" in t.column_names else t,
            batch_format="pyarrow",
        )
    return out


def seasonal_z(ds, options: dict, ctx=None):
    """Seasonal-baseline anomaly score: per (key, season-slot) z-score
    of dense window counts.

    {"type": "seasonal_z", "ts_field": "ts", "key_field": "event_type",
     "window_secs": 3600, "season": "hour_of_day" | "day_of_week",
     "round": 4}

    Pipeline: tumbling counts → gapfill(n=0) → z = (n - mean_slot) /
    stddev_pop_slot where slot = hour-of-day (window/3600 % 24) or
    day-of-week. Output: (key, window_start, n, z); z is null for a
    zero-variance slot. The z-score moments are computed over the
    DENSE series — an hour with no events is a 0 observation, exactly
    what a traffic-drop alert needs."""
    from vector_ray.stages.grouped import zscore
    from vector_ray.stages.window import tumbling

    ts_field = options.get("ts_field", "ts")
    key = options["key_field"]
    size = float(options.get("window_secs", 3600.0))
    season = options.get("season", "hour_of_day")
    if season not in ("hour_of_day", "day_of_week"):
        raise ValueError(f"unknown season {season!r}")
    ndigits = options.get("round", 4)

    counts = tumbling(
        ds,
        {
            "size_secs": size,
            "ts_field": ts_field,
            "key_field": key,
            "aggregates": {"n": {"fn": "count"}},
        },
        ctx,
    )
    dense = gapfill(
        counts,
        {
            "key_field": key,
            "window_field": "window_start",
            "step_secs": size,
            "fill": {"n": 0},
        },
        ctx,
    )

    def add_slot(t: pa.Table) -> pa.Table:
        w = np.asarray(pc.cast(_chunk(t["window_start"]), pa.float64()))
        if season == "hour_of_day":
            slot = (np.floor_divide(w.astype(np.int64), 3600)) % 24
        elif season == "day_of_week":
            # epoch day 0 (1970-01-01) was a Thursday; 0 = Monday
            slot = (np.floor_divide(w.astype(np.int64), 86400) + 3) % 7
        else:
            raise ValueError(f"unknown season {season!r}")
        kcol = pc.cast(_chunk(t[key]), pa.string())
        skey = pc.binary_join_element_wise(
            kcol, pa.array(slot.astype(str)), "|"
        )
        return t.append_column("__slot_key", skey)

    slotted = dense.map_batches(add_slot, batch_format="pyarrow")
    scored = zscore(
        slotted,
        {"group_by": "__slot_key", "field": "n", "target": "z",
         "round": ndigits},
        ctx,
    )
    return scored.map_batches(
        lambda t: t.drop_columns(["__slot_key"]), batch_format="pyarrow"
    )


def burn_rate(ds, options: dict, ctx=None):
    """Multi-window SLO burn rate (SRE-workbook alert shape).

    {"type": "burn_rate", "ts_field": "ts", "error_field": "is_err",
     "short_secs": 3600, "long_secs": 86400, "round": 6}

    error rate of each short window ÷ error rate of its enclosing long
    window. One pass adds both window columns; ONE two-phase aggregate
    on (long, short) produces the short partials; the long totals are
    re-reduced from those tiny partials (events are read once). The
    long-window rate table — one row per long window — is broadcast.
    burn is null when the long-window rate is 0."""
    import ray as _ray

    ts_field = options.get("ts_field", "ts")
    err_field = options["error_field"]
    short = float(options.get("short_secs", 3600.0))
    long_ = float(options.get("long_secs", 86400.0))
    ndigits = options.get("round", 6)
    if long_ % short != 0:
        raise ValueError("long_secs must be a multiple of short_secs")

    from vector_ray.stages.window import _epoch_secs

    def windows(t: pa.Table) -> pa.Table:
        secs = _epoch_secs(t[ts_field])
        ws = pc.multiply(pc.floor(pc.divide(secs, short)), short)
        wl = pc.multiply(pc.floor(pc.divide(secs, long_)), long_)
        err = pc.cast(pc.cast(_chunk(t[err_field]), pa.bool_()), pa.int64())
        return pa.table({
            "window_long": _chunk(wl), "window_short": _chunk(ws),
            "__err": _chunk(err),
        })

    shorts = agg_stage(
        ds.map_batches(windows, batch_format="pyarrow"),
        {
            "group_by": ["window_long", "window_short"],
            "aggregates": {
                "errs": {"fn": "sum", "field": "__err"},
                "n": {"fn": "count"},
            },
        },
        ctx,
    )
    # long-window totals from the tiny short partials (no second pass
    # over events); one float pair per long window → broadcast dict
    longs = agg_stage(
        shorts,
        {
            "group_by": ["window_long"],
            "aggregates": {
                "errs_l": {"fn": "sum", "field": "errs"},
                "n_l": {"fn": "sum", "field": "n"},
            },
        },
        ctx,
    ).take_all()
    lrate = {
        r["window_long"]: round_sql_np(
            round_sql_np(
                np.float64(r["errs_l"]) / np.float64(r["n_l"]), 9
            ),
            ndigits,
        )
        for r in longs
    }
    ref = _ray.put(lrate)

    def score(t: pa.Table) -> pa.Table:
        lookup = _ray.get(ref)
        errs = np.asarray(pc.cast(t["errs"], pa.float64()))
        n = np.asarray(pc.cast(t["n"], pa.float64()))
        sr = round_sql_np(round_sql_np(errs / n, 9), ndigits)
        wl = np.asarray(pc.cast(t["window_long"], pa.float64()))
        lr = np.array([lookup[v] for v in wl], np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            burn = round_sql_np(round_sql_np(sr / lr, 9), ndigits)
        out = pa.table({
            "window_long": _chunk(t["window_long"]),
            "window_short": _chunk(t["window_short"]),
            "short_rate": pa.array(sr, pa.float64()),
            "long_rate": pa.array(lr, pa.float64()),
        })
        barr = pa.array(burn, pa.float64())
        barr = pc.if_else(
            pa.array(lr == 0.0), pa.scalar(None, pa.float64()), barr
        )
        return out.append_column("burn", barr)

    return shorts.map_batches(score, batch_format="pyarrow")


def winsorize(ds, options: dict, ctx=None):
    """Clip a value column to its global [q_lo, q_hi] quantiles
    (outlier trimming before stats/training).

    {"type": "winsorize", "field": "value", "lo": 0.01, "hi": 0.99,
     "target": "value_w", "round": 6}

    Two passes: exact global quantile thresholds via the two-phase
    quantile aggregate (np.quantile linear interpolation ==
    quantile_cont), rounded to 9 digits on both engines and broadcast;
    then one vectorized clip per batch."""
    import ray as _ray

    field = options["field"]
    qlo = float(options.get("lo", 0.01))
    qhi = float(options.get("hi", 0.99))
    target = options.get("target", f"{field}_w")
    ndigits = options.get("round", 6)

    stats = agg_stage(
        ds.map_batches(
            lambda t: t.select([field]).append_column(
                "__one", pa.array(np.ones(t.num_rows, np.int8))
            ),
            batch_format="pyarrow",
        ),
        {
            "group_by": ["__one"],
            "aggregates": {
                "lo": {"fn": "quantile", "field": field, "q": qlo},
                "hi": {"fn": "quantile", "field": field, "q": qhi},
            },
        },
        ctx,
    ).take_all()
    row = stats[0]
    thr = (
        float(round_sql_np(np.float64(row["lo"]), 9)),
        float(round_sql_np(np.float64(row["hi"]), 9)),
    )
    ref = _ray.put(thr)

    def clip(t: pa.Table) -> pa.Table:
        lo_v, hi_v = _ray.get(ref)
        x = np.asarray(pc.cast(t[field], pa.float64()))
        w = round_sql_np(round_sql_np(np.clip(x, lo_v, hi_v), 9), ndigits)
        arr = pa.array(w, pa.float64())
        null_mask = pc.is_null(t[field])
        if pc.any(null_mask).as_py():
            arr = pc.if_else(null_mask, pa.scalar(None, pa.float64()), arr)
        return t.append_column(target, arr)

    return ds.map_batches(clip, batch_format="pyarrow")
