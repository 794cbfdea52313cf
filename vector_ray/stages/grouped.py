"""Grouped / wide transforms: dedupe, throttle, reduce, aggregate.

These are the shuffle stages (SURVEY.md §7.3). ``aggregate`` is always
two-phase: vectorized per-batch partial aggregation inside ``map_batches``
(one row per key per batch) followed by a small ``groupby`` over the
partials — the skew-safe pattern the north rule requires for the
zipf-distributed ``source`` key. ``dedupe``/``throttle``/``reduce`` hash-
shuffle on their group key and run per-group Arrow kernels in
``map_groups`` (no pandas round-trip: token list<int32> columns stay
byte-exact).

Reference semantics: dedupe (palette.rs:137, config_panel.rs:1713-1751),
throttle (palette.rs:134, config_panel.rs:1671-1709), reduce
(palette.rs:138, config_panel.rs:1756-1794), aggregate (palette.rs:139,
config_panel.rs:1831-1861). Window options become derived grouping
columns — the documented batch-mode approximation of Vector's streaming
windows (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _first_by(t: pa.Table, order_by: list[str], n: int = 1) -> pa.Table:
    idx = pc.sort_indices(
        t, sort_keys=[(c, "ascending") for c in order_by]
    )
    return t.take(idx.slice(0, n))


# ---------------------------------------------------------------------------
# dedupe — exact dedup: one surviving row per distinct match-tuple.
# Vector keeps the first-seen event within an LRU window; in batch mode
# "first" is defined deterministically as the min of ``order_by``
# (default: first match field), since Ray Data has no arrival order.
# ---------------------------------------------------------------------------


def dedupe(ds, options: dict, ctx=None):
    match = list(options.get("fields", {}).get("match") or options["match"])
    order_by = list(options.get("order_by") or match[:1])
    keep = options.get("keep", "first")
    if keep not in ("first", "last"):
        raise ValueError(f"dedupe keep must be first|last, got {keep!r}")
    desc = keep == "last"

    def take(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            t,
            sort_keys=[
                (c, "descending" if desc else "ascending") for c in order_by
            ],
        )
        return t.take(idx.slice(0, 1))

    return ds.groupby(match).map_groups(take, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# throttle — at most `threshold` events per (key, window); window =
# floor(ts / window_secs). Deterministic: survivors are the first
# `threshold` rows ordered by ``order_by`` (default the ts field).
#
# Two-phase (skew-safe): a per-batch local prune keeps at most
# `threshold` rows per (key, window) BEFORE the groupby shuffle, so a
# hot key ships ≤ threshold × num_blocks rows instead of its full group.
# Correct because the global first-`threshold` of a group is always a
# subset of the union of each block's local first-`threshold`.
# ---------------------------------------------------------------------------

THROTTLE_WINDOW = "__window"


def local_head_per_group(
    t: pa.Table, group_cols: list[str], order_by: list[str], n: int
) -> pa.Table:
    """Keep the first `n` rows per group-tuple WITHIN this table —
    vectorized: one sort + numpy group-boundary rank, no per-group loop.
    Null-boundary comparisons conservatively count as a group change
    (splitting a group locally only keeps extra rows — still a superset
    of the global head, so pruning stays correct)."""
    if t.num_rows == 0:
        return t
    sort_keys = [(c, "ascending") for c in group_cols + order_by]
    ts = t.take(pc.sort_indices(t, sort_keys=sort_keys)).combine_chunks()
    nrows = ts.num_rows
    change = np.zeros(nrows, dtype=bool)
    change[0] = True
    for c in group_cols:
        a = ts[c]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        neq = pc.not_equal(a.slice(1), a.slice(0, nrows - 1))
        change[1:] |= np.asarray(
            pc.fill_null(neq, True).to_numpy(zero_copy_only=False)
        )
    starts = np.flatnonzero(change)
    gid = np.cumsum(change) - 1
    rank = np.arange(nrows) - starts[gid]
    return ts.filter(pa.array(rank < n))


def throttle(ds, options: dict, ctx=None):
    threshold = int(options.get("threshold", 10))
    window_secs = float(options.get("window_secs", 1.0))
    key = options.get("key_field")
    ts_field = options.get("ts_field", "ts")
    order_by = list(options.get("order_by") or [ts_field])
    group_cols = ([key] if key else []) + [THROTTLE_WINDOW]

    def add_window_and_prune(t: pa.Table) -> pa.Table:
        ts = t[ts_field]
        if pa.types.is_timestamp(ts.type):
            secs = pc.cast(pc.cast(ts, pa.int64()), pa.float64())
            unit = {"s": 1.0, "ms": 1e3, "us": 1e6, "ns": 1e9}[ts.type.unit]
            secs = pc.divide(secs, unit)
        else:
            secs = pc.cast(ts, pa.float64())
        win = pc.cast(pc.floor(pc.divide(secs, window_secs)), pa.int64())
        if isinstance(win, pa.ChunkedArray):
            win = win.combine_chunks()
        t = t.append_column(THROTTLE_WINDOW, win)
        # phase 1: local prune — bounds what the shuffle moves per key
        return local_head_per_group(t, group_cols, order_by, threshold)

    def head(t: pa.Table) -> pa.Table:
        return _first_by(t, order_by, threshold)

    out = (
        ds.map_batches(add_window_and_prune, batch_format="pyarrow")
        .groupby(group_cols)
        .map_groups(head, batch_format="pyarrow")
    )
    return out.map_batches(
        lambda t: t.drop_columns([THROTTLE_WINDOW]), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# reduce — collapse each group to one row by per-column merge strategies
# (sum | min | max | mean | first | last | concat | count). Unlisted
# columns default to "first" (ordered by ``order_by``).
# ---------------------------------------------------------------------------


def reduce_(ds, options: dict, ctx=None):
    group_by = list(options["group_by"])
    strategies: dict = dict(options.get("merge_strategies") or {})
    order_by = list(options.get("order_by") or group_by)
    count_as = options.get("count_field")  # emit group size under this name
    # ends_when (config_panel.rs:1771-1791): a VRL condition that CLOSES
    # the current window — the matching row is the window's last row and
    # the next row starts a new window. Batch mode: rows are ordered by
    # ``order_by`` within the group; window id = number of end-marker
    # rows strictly before the row. Emitted under ``window_field``.
    ends_when = options.get("ends_when")
    window_field = options.get("window_field", "wid")
    predicate = None
    if ends_when is not None:
        from vector_ray.vrl import compile_predicate

        predicate = compile_predicate(ends_when)

    def merge_one(t_sorted: pa.Table) -> dict:
        out: dict[str, pa.Array] = {}
        n = t_sorted.num_rows
        for col in group_by:
            out[col] = t_sorted[col].slice(0, 1).combine_chunks()
        for col in t_sorted.column_names:
            if col in group_by:
                continue
            strat = strategies.get(col, "first")
            c = t_sorted[col]
            # "discard"/"retain" are Vector's names for keep-first /
            # keep-last (config_panel.rs merge-strategy list)
            if strat in ("first", "discard"):
                out[col] = c.slice(0, 1).combine_chunks()
            elif strat in ("last", "retain"):
                out[col] = c.slice(n - 1, 1).combine_chunks()
            elif strat == "sum":
                out[col] = pa.array([pc.sum(c).as_py()])
            elif strat == "min":
                out[col] = pa.array([pc.min(c).as_py()], c.type)
            elif strat == "max":
                out[col] = pa.array([pc.max(c).as_py()], c.type)
            elif strat == "mean":
                out[col] = pa.array([pc.mean(c).as_py()], pa.float64())
            elif strat == "concat":
                strs = pc.cast(c, pa.string()).to_pylist()
                out[col] = pa.array([" ".join(s for s in strs if s is not None)])
            elif strat == "concat_newline":
                strs = pc.cast(c, pa.string()).to_pylist()
                out[col] = pa.array(["\n".join(s for s in strs if s is not None)])
            elif strat == "array":
                out[col] = pa.array(
                    [c.combine_chunks().to_pylist()], pa.list_(c.type)
                )
            elif strat == "flat_unique":
                cc = c.combine_chunks()
                if pa.types.is_list(cc.type) or pa.types.is_large_list(cc.type):
                    flat, typ = cc.flatten(), cc.type.value_type
                else:
                    flat, typ = cc, cc.type
                uniq = pc.unique(flat.drop_null())
                # deterministic order (Vector's is hash-set order — any
                # stable rule is as faithful; sorted is reproducible)
                uniq = uniq.take(pc.sort_indices(uniq))
                out[col] = pa.array([uniq.to_pylist()], pa.list_(typ))
            elif strat in ("longest_array", "shortest_array"):
                cc = c.combine_chunks()
                if not (pa.types.is_list(cc.type) or pa.types.is_large_list(cc.type)):
                    raise ValueError(f"{strat} requires a list column, got {cc.type}")
                lens = pc.list_value_length(cc).to_numpy(zero_copy_only=False)
                lens = np.where(np.isnan(lens.astype(np.float64)), -1, lens)
                # first occurrence wins ties (argmax/argmin semantics)
                i = int(np.argmax(lens) if strat == "longest_array" else
                        np.argmin(np.where(lens < 0, np.iinfo(np.int64).max, lens)))
                out[col] = cc.slice(i, 1)
            elif strat == "drop":
                continue
            else:
                raise ValueError(f"unknown merge strategy {strat!r} for {col}")
        if count_as:
            out[count_as] = pa.array([n], pa.int64())
        return out

    def merge(t: pa.Table) -> pa.Table:
        t_sorted = t.take(
            pc.sort_indices(t, sort_keys=[(c, "ascending") for c in order_by])
        ).combine_chunks()
        if predicate is None:
            return pa.table(merge_one(t_sorted))
        mask = predicate(t_sorted)
        if isinstance(mask, pa.ChunkedArray):
            mask = mask.combine_chunks()
        ends = np.asarray(mask.to_numpy(zero_copy_only=False)).astype(np.int64)
        # window id = end-markers strictly before the row (marker row is
        # INCLUSIVE — it is its window's last row)
        wid = np.concatenate([[0], np.cumsum(ends)[:-1]])
        parts = []
        for w in np.unique(wid):
            sel = np.nonzero(wid == w)[0]
            sub = t_sorted.slice(int(sel[0]), len(sel))
            out = merge_one(sub)
            out[window_field] = pa.array([int(w)], pa.int64())
            parts.append(pa.table(out))
        return pa.concat_tables(parts)

    return ds.groupby(group_by).map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# aggregate — two-phase grouped aggregation.
#   options = {"group_by": [...],
#              "aggregates": {out_name: {"fn": "sum|count|mean|min|max"
#                                              "|count_distinct|quantile"
#                                              "|p50|p90|p99|median"
#                                              "|approx_count_distinct"
#                                              "|approx_quantile"
#                                              "|approx_p50|approx_p90|...",
#                                        "field": col, "q": float}},
#              "round": int | None}
# Phase 1 (map_batches): pa.Table.group_by per batch → one partial row per
# key per batch. Phase 2: ray groupby over partials (tiny shuffle).
#
# Quantiles (the Distribution/Histogram/Summary metric value kinds,
# reference shared/src/messages.rs:176-183) and exact count_distinct are
# also two-phase: the per-batch partial collapses a key's values to a
# (distinct, for count_distinct) LIST — so the shuffle moves one value
# column per key per batch, never whole rows — and the final per-key
# merge concatenates the partial lists and computes the exact statistic
# (np.quantile linear interpolation == SQL quantile_cont). The per-key
# value vector lives on one worker during the merge — the same
# requirement any exact quantile has.
# ---------------------------------------------------------------------------

_PA_FN = {"sum": "sum", "min": "min", "max": "max"}
# variance family: (sample?, sqrt?) — matches SQL var_samp/var_pop/
# stddev_samp/stddev_pop over non-null columns (like mean, the count
# leg counts rows; feed non-null fields)
_VAR_FN = {
    "var": (True, False),
    "var_pop": (False, False),
    "stddev": (True, True),
    "stddev_pop": (False, True),
}
_QUANTILE_FN = {
    "p50": 0.5, "median": 0.5, "p75": 0.75, "p90": 0.9, "p95": 0.95,
    "p99": 0.99,
}
_APPROX_QUANTILE_FN = {
    "approx_p50": 0.5,
    "approx_median": 0.5,
    "approx_p90": 0.9,
    "approx_p99": 0.99,
}


def _agg_q(fn: str, spec: dict) -> float:
    if fn in ("quantile", "approx_quantile"):
        return float(spec.get("q"))
    return _QUANTILE_FN.get(fn) or _APPROX_QUANTILE_FN[fn]


def compile_partial_agg(group_by: list[str], aggregates: dict) -> Callable:
    specs = []  # (partial_col_in, pa_agg, partial_out_name)
    # histogram bucket counts (Vector's Histogram/Summary metric values,
    # shared/src/messages.rs:176-183, Prometheus-style cumulative `le`
    # buckets): count rows with field <= le, two-phase via a 0/1
    # indicator column summed like any other partial
    ind_specs = []  # (out, field, le)
    # sketch aggregates (functions/sketches.py): the per-batch partial
    # is FIXED-SIZE state per key (HLL registers / occupied log-linear
    # buckets), so the shuffle cost is independent of rows-per-key —
    # the 100 TB path next to the exact list-carrying variants
    sketch_specs = []  # (out, "hll" | "ll", field)
    for out, spec in aggregates.items():
        fn, field = spec["fn"], spec.get("field")
        if fn == "count":
            specs.append(("count", None, f"__p_{out}"))
        elif fn == "mean":
            specs.append(("sum", field, f"__ps_{out}"))
            specs.append(("count", None, f"__pc_{out}"))
        elif fn in _VAR_FN:
            # two-phase moments: sum(x), sum(x^2), n — combined at the
            # final merge into sample/population variance or stddev
            specs.append(("sum", f"__sq_{out}", f"__pq_{out}"))
            specs.append(("sum", field, f"__ps_{out}"))
            specs.append(("count", None, f"__pc_{out}"))
        elif fn in _PA_FN:
            specs.append((fn, field, f"__p_{out}"))
        elif fn in _QUANTILE_FN or fn == "quantile":
            specs.append(("list", field, f"__pl_{out}"))
        elif fn == "count_distinct":
            specs.append(("distinct", field, f"__pd_{out}"))
        elif fn == "approx_count_distinct":
            # sketch inputs/partials are keyed by FIELD, not output name:
            # N sketch aggregates over one column share one hash/index
            # column, one per-key list, and one shuffled partial
            if ("hll", field) not in {(k, f) for _, k, f in sketch_specs}:
                specs.append(("list", f"__skh_{field}", f"__rawh_{field}"))
            sketch_specs.append((out, "hll", field))
        elif fn in _APPROX_QUANTILE_FN or fn == "approx_quantile":
            if ("ll", field) not in {(k, f) for _, k, f in sketch_specs}:
                specs.append(("list", f"__skx_{field}", f"__rawx_{field}"))
            sketch_specs.append((out, "ll", field))
        elif fn == "count_le":
            ind_specs.append((out, field, float(spec["le"])))
            specs.append(("sum", f"__ind_{out}", f"__p_{out}"))
        else:
            raise ValueError(f"unknown aggregate fn {fn!r}")

    var_specs = [
        (out, spec["field"])
        for out, spec in aggregates.items()
        if spec["fn"] in _VAR_FN
    ]

    def add_indicators(t: pa.Table) -> pa.Table:
        for out, field in var_specs:
            sq = pc.multiply(
                pc.cast(t[field], pa.float64()), pc.cast(t[field], pa.float64())
            )
            t = t.append_column(
                f"__sq_{out}",
                sq.combine_chunks() if isinstance(sq, pa.ChunkedArray) else sq,
            )
        for out, field, le in ind_specs:
            ind = pc.cast(
                pc.fill_null(pc.less_equal(t[field], le), False), pa.int64()
            )
            t = t.append_column(
                f"__ind_{out}",
                ind.combine_chunks() if isinstance(ind, pa.ChunkedArray) else ind,
            )
        # whole-batch vectorized sketch inputs: the FNV value hash for
        # HLL, the log-linear bucket index for approx quantiles; the
        # arrow group_by then only collects small per-key lists of them.
        # One input column per distinct (kind, field) — N aggregates
        # over the same column share it.
        for kind, field in dict.fromkeys((k, f) for _, k, f in sketch_specs):
            col = t[field]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if kind == "hll":
                if pa.types.is_floating(col.type):
                    raise ValueError(
                        "approx_count_distinct over float columns is not "
                        "supported (string form is not canonical); cast "
                        "or hash upstream"
                    )
                from vector_ray.functions.sketches import HLL_NULL
                from vector_ray.stages.core import _stable_hash_u64

                h = _stable_hash_u64(pc.cast(col, pa.string()))
                # nulls don't count as a distinct value: tag them with a
                # sentinel the register builder skips (a real value
                # hashing to it is a 2^-64 event inside a ~1.6 %-error op)
                if col.null_count:
                    nulls = np.asarray(
                        pc.is_null(col).to_numpy(zero_copy_only=False)
                    )
                    h = np.where(nulls, HLL_NULL, h)
                t = t.append_column(f"__skh_{field}", pa.array(h, pa.uint64()))
            else:
                from vector_ray.functions.sketches import LL_NULL, ll_indices

                vals = pc.cast(col, pa.float64())
                npv = vals.to_numpy(zero_copy_only=False)
                # null-mask from arrow validity, NOT np.isnan: a genuine
                # (non-null) NaN value must reach ll_indices and raise,
                # not be silently dropped as if it were a null
                if col.null_count:
                    null_mask = np.asarray(
                        pc.is_null(col).to_numpy(zero_copy_only=False)
                    )
                    ix = ll_indices(np.where(null_mask, 0.0, npv))
                    ix = np.where(null_mask, LL_NULL, ix)
                else:
                    ix = ll_indices(npv)
                t = t.append_column(f"__skx_{field}", pa.array(ix, pa.int64()))
        return t

    def partial(t: pa.Table) -> pa.Table:
        t = add_indicators(t)
        if t.num_rows == 0:
            cols = {c: pa.array([], t.schema.field(c).type) for c in group_by}
            for kind, field, name in specs:
                if name.startswith(("__rawh_", "__rawx_")):
                    continue  # sketch partials are emitted below
                if kind == "count":
                    typ = pa.int64()
                elif kind in ("list", "distinct"):
                    typ = pa.list_(t.schema.field(field).type)
                else:
                    typ = t.schema.field(field).type
                if kind == "sum" and pa.types.is_integer(typ):
                    typ = pa.int64()
                elif kind == "sum":
                    typ = pa.float64()
                cols[name] = pa.array([], typ)
            for kind, field in dict.fromkeys((k, f) for _, k, f in sketch_specs):
                if kind == "hll":
                    cols[f"__ph_{field}"] = pa.array([], pa.binary())
                else:
                    cols[f"__pi_{field}"] = pa.array([], pa.list_(pa.int64()))
                    cols[f"__pn_{field}"] = pa.array([], pa.list_(pa.int64()))
            return pa.table(cols)
        agg_specs, renames, seen = [], {}, set()
        for kind, field, name in specs:
            if kind == "count":
                src = "count_all"
                if src not in seen:
                    agg_specs.append(([], "count_all"))
            else:
                src = f"{field}_{kind}"
                if src not in seen:
                    agg_specs.append((field, kind))
            seen.add(src)
            renames.setdefault(src, []).append(name)
        g = t.group_by(group_by).aggregate(agg_specs)
        cols = {c: g[c] for c in group_by}
        for src, names in renames.items():
            for name in names:
                cols[name] = g[src]
        # collapse each key's sketch-input list into fixed-size state:
        # HLL register bytes / occupied (bucket, count) pairs — this is
        # what crosses the shuffle instead of the raw values
        for kind, field in dict.fromkeys((k, f) for _, k, f in sketch_specs):
            if kind == "hll":
                raw = cols.pop(f"__rawh_{field}")
            else:
                raw = cols.pop(f"__rawx_{field}")
            if isinstance(raw, pa.ChunkedArray):
                raw = raw.combine_chunks()
            if kind == "hll":
                from vector_ray.functions.sketches import HLL_NULL, hll_registers

                regs = []
                for i in range(len(raw)):
                    hs = np.asarray(
                        raw[i].values.to_numpy(zero_copy_only=False)
                    ).astype(np.uint64)
                    hs = hs[hs != HLL_NULL]
                    regs.append(hll_registers(hs).tobytes())
                cols[f"__ph_{field}"] = pa.array(regs, pa.binary())
            else:
                from vector_ray.functions.sketches import LL_NULL

                idx_lists, cnt_lists = [], []
                for i in range(len(raw)):
                    ix = np.asarray(
                        raw[i].values.to_numpy(zero_copy_only=False), np.int64
                    )
                    ix = ix[ix != LL_NULL]
                    u, c = np.unique(ix, return_counts=True)
                    idx_lists.append(u.tolist())
                    cnt_lists.append(c.tolist())
                cols[f"__pi_{field}"] = pa.array(idx_lists, pa.list_(pa.int64()))
                cols[f"__pn_{field}"] = pa.array(cnt_lists, pa.list_(pa.int64()))
        return pa.table(cols)

    return partial


def _round_and_order(t: pa.Table, group_by, aggregates, ndigits) -> pa.Table:
    # per-aggregate {"round": N} overrides the top-level option for its
    # column (previously a silently ignored key — a config foot-gun)
    per_col = {
        name: spec.get("round")
        for name, spec in aggregates.items()
        if isinstance(spec, dict) and spec.get("round") is not None
    }
    for col in t.column_names:
        nd = per_col.get(col, ndigits)
        if nd is not None and pa.types.is_floating(t.schema.field(col).type):
            i = t.column_names.index(col)
            # half_towards_infinity matches SQL ROUND semantics
            # (DuckDB oracle parity); arrow default is half_to_even
            t = t.set_column(
                i,
                col,
                pc.round(t[col], ndigits=nd, round_mode="half_towards_infinity"),
            )
    order = group_by + [o for o in aggregates if o in t.column_names]
    return t.select(order)


def _aggregate_with_lists(ds, group_by, aggregates, ndigits):
    """Final phase when quantile / count_distinct aggregates are present:
    per-key map_groups over the partials (partial rows carry value lists
    for those aggregates and scalar partials for the rest)."""

    def merge_key(g: pa.Table) -> pa.Table:
        out: dict = {c: g[c].slice(0, 1).combine_chunks() for c in group_by}
        for name, spec in aggregates.items():
            fn = spec["fn"]
            if fn in ("count", "count_le"):
                out[name] = pa.array([pc.sum(g[f"__p_{name}"]).as_py() or 0], pa.int64())
            elif fn == "sum":
                v = pc.sum(g[f"__p_{name}"]).as_py()
                typ = pa.int64() if spec.get("int") else pa.float64()
                out[name] = pa.array([v], typ)
            elif fn == "min":
                out[name] = pa.array([pc.min(g[f"__p_{name}"]).as_py()],
                                     g.schema.field(f"__p_{name}").type)
            elif fn == "max":
                out[name] = pa.array([pc.max(g[f"__p_{name}"]).as_py()],
                                     g.schema.field(f"__p_{name}").type)
            elif fn == "mean":
                s = pc.sum(g[f"__ps_{name}"]).as_py() or 0.0
                c = pc.sum(g[f"__pc_{name}"]).as_py() or 0
                out[name] = pa.array([s / c if c else None], pa.float64())
            elif fn in _VAR_FN:
                sample, sqrt_ = _VAR_FN[fn]
                s = pc.sum(g[f"__ps_{name}"]).as_py() or 0.0
                q = pc.sum(g[f"__pq_{name}"]).as_py() or 0.0
                c = pc.sum(g[f"__pc_{name}"]).as_py() or 0
                denom = (c - 1) if sample else c
                if denom <= 0:
                    out[name] = pa.array([None], pa.float64())
                else:
                    v = max((q - s * s / c) / denom, 0.0)
                    out[name] = pa.array(
                        [np.sqrt(v) if sqrt_ else v], pa.float64()
                    )
            elif fn in _QUANTILE_FN or fn == "quantile":
                col = g[f"__pl_{name}"]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                flat = col.flatten()
                if flat.null_count:
                    flat = flat.drop_null()  # quantile_cont ignores NULLs
                vals = np.asarray(flat, dtype=np.float64)
                q = _agg_q(fn, spec)
                # np.quantile 'linear' == SQL quantile_cont interpolation;
                # pre-round through 9 decimals so the interpolation's
                # last-ulp difference vs the SQL engine can't land on
                # opposite sides of the final rounding boundary (the
                # oracle applies the same ROUND(ROUND(x, 9), d))
                from vector_ray.schema import round_sql_np

                out[name] = pa.array(
                    [float(round_sql_np(np.quantile(vals, q), 9)) if len(vals) else None],
                    pa.float64(),
                )
            elif fn == "count_distinct":
                col = g[f"__pd_{name}"]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                flat = col.flatten()
                out[name] = pa.array(
                    [len(pc.unique(flat.drop_null()))], pa.int64()
                )
            elif fn == "approx_count_distinct":
                from vector_ray.functions.sketches import hll_estimate, hll_merge

                col = g[f"__ph_{spec['field']}"]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                reg = hll_merge(col.to_pylist())
                out[name] = pa.array([hll_estimate(reg)], pa.int64())
            elif fn in _APPROX_QUANTILE_FN or fn == "approx_quantile":
                from vector_ray.functions.sketches import ll_merge, ll_quantile

                ic = g[f"__pi_{spec['field']}"]
                nc = g[f"__pn_{spec['field']}"]
                if isinstance(ic, pa.ChunkedArray):
                    ic = ic.combine_chunks()
                if isinstance(nc, pa.ChunkedArray):
                    nc = nc.combine_chunks()
                # per-row lists are emitted pairwise by the partial, so
                # the flattened arrays stay elementwise aligned
                ii = np.asarray(ic.flatten().to_numpy(zero_copy_only=False), np.int64)
                cc = np.asarray(nc.flatten().to_numpy(zero_copy_only=False), np.int64)
                u, c = ll_merge(ii, cc)
                out[name] = pa.array(
                    [ll_quantile(u, c, _agg_q(fn, spec))], pa.float64()
                )
        return pa.table(out)

    partial = compile_partial_agg(group_by, aggregates)
    partials = ds.map_batches(partial, batch_format="pyarrow")
    final = partials.groupby(group_by).map_groups(merge_key, batch_format="pyarrow")
    return final.map_batches(
        lambda t: _round_and_order(t, group_by, aggregates, ndigits),
        batch_format="pyarrow",
    )


def aggregate(ds, options: dict, ctx=None):
    group_by = list(options["group_by"])
    aggregates = dict(options["aggregates"])
    ndigits = options.get("round")

    if any(
        s["fn"] in _QUANTILE_FN
        or s["fn"] in _APPROX_QUANTILE_FN
        or s["fn"]
        in ("quantile", "count_distinct", "approx_count_distinct", "approx_quantile")
        for s in aggregates.values()
    ):
        return _aggregate_with_lists(ds, group_by, aggregates, ndigits)

    partial = compile_partial_agg(group_by, aggregates)
    partials = ds.map_batches(partial, batch_format="pyarrow")

    ray_aggs = []
    for out, spec in aggregates.items():
        fn = spec["fn"]
        if fn in ("count", "count_le"):
            ray_aggs.append(Sum(f"__p_{out}", alias_name=out))
        elif fn == "mean":
            ray_aggs.append(Sum(f"__ps_{out}", alias_name=f"__s_{out}"))
            ray_aggs.append(Sum(f"__pc_{out}", alias_name=f"__c_{out}"))
        elif fn in _VAR_FN:
            ray_aggs.append(Sum(f"__ps_{out}", alias_name=f"__s_{out}"))
            ray_aggs.append(Sum(f"__pq_{out}", alias_name=f"__q_{out}"))
            ray_aggs.append(Sum(f"__pc_{out}", alias_name=f"__c_{out}"))
        elif fn == "sum":
            ray_aggs.append(Sum(f"__p_{out}", alias_name=out))
        elif fn == "min":
            ray_aggs.append(Min(f"__p_{out}", alias_name=out))
        elif fn == "max":
            ray_aggs.append(Max(f"__p_{out}", alias_name=out))
    final = partials.groupby(group_by).aggregate(*ray_aggs)

    var_outs = [o for o, s in aggregates.items() if s["fn"] in _VAR_FN]
    mean_outs = [o for o, s in aggregates.items() if s["fn"] == "mean"]
    count_outs = [
        o for o, s in aggregates.items() if s["fn"] in ("count", "count_le")
    ]
    sum_int = [
        o for o, s in aggregates.items()
        if s["fn"] == "sum" and s.get("int", False)
    ]

    def finish(t: pa.Table) -> pa.Table:
        for out in var_outs:
            sample, sqrt_ = _VAR_FN[aggregates[out]["fn"]]
            s = np.asarray(pc.cast(t[f"__s_{out}"], pa.float64()))
            q = np.asarray(pc.cast(t[f"__q_{out}"], pa.float64()))
            c = np.asarray(pc.cast(t[f"__c_{out}"], pa.float64()))
            denom = (c - 1.0) if sample else c
            with np.errstate(divide="ignore", invalid="ignore"):
                v = np.maximum((q - s * s / c) / denom, 0.0)
            v = np.where(denom <= 0, np.nan, v)
            if sqrt_:
                v = np.sqrt(v)
            arr = pa.array(v, pa.float64())
            arr = pc.if_else(pc.is_nan(arr), pa.scalar(None, pa.float64()), arr)
            t = t.append_column(out, arr)
            t = t.drop_columns([f"__s_{out}", f"__q_{out}", f"__c_{out}"])
        for out in mean_outs:
            mean = pc.divide(
                pc.cast(t[f"__s_{out}"], pa.float64()),
                pc.cast(t[f"__c_{out}"], pa.float64()),
            )
            t = t.append_column(out, mean.combine_chunks() if isinstance(mean, pa.ChunkedArray) else mean)
            t = t.drop_columns([f"__s_{out}", f"__c_{out}"])
        for out in count_outs + sum_int:
            i = t.column_names.index(out)
            t = t.set_column(i, out, pc.cast(t[out], pa.int64()))
        # stable column order: group keys then aggregate outputs
        return _round_and_order(t, group_by, aggregates, ndigits)

    return final.map_batches(finish, batch_format="pyarrow")


def zscore(ds, options: dict, ctx=None):
    """Per-group z-score normalization: z = (x - mean_g) / stddev_pop_g.

    {"type": "zscore", "group_by": "event_type", "field": "value",
     "target": "z", "round": 4}

    Two passes: the per-group moments come from the two-phase
    ``aggregate`` (a tiny table, one row per group) and broadcast via
    ``ray.put``; the second pass normalizes each batch with a
    dictionary-encoded key lookup (one Python dict hit per DISTINCT
    key per batch). A zero-variance group normalizes to null. For key
    spaces too large to broadcast, join the stats back with
    ``bucketed_join`` instead — this stage targets the telemetry shape
    (bounded group count, unbounded rows)."""
    import ray as _ray

    from vector_ray.schema import round_sql_np

    key = options["group_by"]
    if not isinstance(key, str):
        raise ValueError("zscore group_by must be a single key column")
    field = options["field"]
    target = options.get("target", "z")
    ndigits = options.get("round")

    max_groups = int(options.get("max_groups", 5_000_000))
    stats = aggregate(
        ds,
        {
            "group_by": [key],
            "aggregates": {
                "__m": {"fn": "mean", "field": field},
                "__s": {"fn": "stddev_pop", "field": field},
            },
        },
    ).take_all()
    if len(stats) > max_groups:
        raise ValueError(
            f"zscore over {len(stats)} groups exceeds max_groups="
            f"{max_groups}; join the stats back with bucketed_join "
            f"instead of broadcasting"
        )
    table = {
        r[key]: (float(r["__m"]), float(r["__s"]) if r["__s"] is not None else 0.0)
        for r in stats
    }
    ref = _ray.put(table)

    def norm(t: pa.Table) -> pa.Table:
        lookup = _ray.get(ref)
        enc = t[key].combine_chunks().dictionary_encode()
        ms = np.array(
            [lookup.get(k, (np.nan, 0.0)) for k in enc.dictionary.to_pylist()]
        )
        codes = enc.indices.to_numpy(zero_copy_only=False)
        mean, std = ms[codes, 0], ms[codes, 1]
        x = np.asarray(pc.cast(t[field], pa.float64()))
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (x - mean) / std
        z = np.where(std == 0.0, np.nan, z)
        if ndigits is not None:
            z = round_sql_np(round_sql_np(z, 9), ndigits)
        arr = pa.array(z, pa.float64())
        arr = pc.if_else(pc.is_nan(arr), pa.scalar(None, pa.float64()), arr)
        return t.append_column(target, arr)

    return ds.map_batches(norm, batch_format="pyarrow")


def funnel(ds, options: dict, ctx=None):
    """Per-entity funnel progression: how far each entity advances
    through an ordered step sequence, each step strictly after the
    previous one (greedy-earliest matching, which is optimal for
    sequence containment).

    {"type": "funnel", "group_by": "user_id", "steps":
     ["view", "click", "purchase"], "type_field": "event_type",
     "ts_field": "ts"}

    One hash shuffle on the entity key; each group resolves its steps
    with len(steps) vectorized min-scans (no per-row Python). Output:
    (key, steps_completed) for every entity.

    Partitioning assumption (same as SQL PARTITION BY): one key's
    rows fit one worker; a pathologically hot key becomes a straggler
    (pre-split upstream or salt if a key can exceed worker memory)."""
    key = options["group_by"]
    steps = list(options["steps"])
    type_field = options.get("type_field", "event_type")
    ts_field = options.get("ts_field", "ts")
    out_field = options.get("out_field", "steps_completed")

    def resolve(g: pa.Table) -> pa.Table:
        types = g[type_field]
        ts = g[ts_field]
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        done, prev = 0, None
        for step in steps:
            mask = pc.equal(types, step)
            if prev is not None:
                mask = pc.and_(mask, pc.greater(ts, prev))
            cand = ts.filter(pc.fill_null(mask, False))
            if len(cand) == 0:
                break
            prev = pc.min(cand)
            done += 1
        return pa.table(
            {
                key: g[key].slice(0, 1).combine_chunks(),
                out_field: pa.array([done], pa.int64()),
            }
        )

    return ds.groupby(key).map_groups(resolve, batch_format="pyarrow")


def interarrival(ds, options: dict, ctx=None):
    """Per-key event-gap statistics — the heartbeat/gap-detection shape
    (how regularly does each source emit?).

    {"type": "interarrival", "group_by": "user_id", "ts_field": "ts",
     "round": 4}

    One hash shuffle on the key; each group sorts its timestamps once
    and diffs them vectorized. Output per key: n_events, mean_gap_s,
    max_gap_s (null for single-event keys, like SQL AVG/MAX over an
    empty lag set).

    Partitioning assumption (same as SQL PARTITION BY): one key's
    rows fit one worker; a pathologically hot key becomes a straggler
    (pre-split upstream or salt if a key can exceed worker memory)."""
    from vector_ray.schema import round_sql_np

    key = options["group_by"]
    ts_field = options.get("ts_field", "ts")
    ndigits = options.get("round")

    def gaps(g: pa.Table) -> pa.Table:
        ts = g[ts_field]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if pa.types.is_timestamp(ts.type):
            unit = {"s": 1.0, "ms": 1e3, "us": 1e6, "ns": 1e9}[ts.type.unit]
            secs = np.asarray(pc.cast(ts, pa.int64())) / unit
        else:
            secs = np.asarray(pc.cast(ts, pa.float64()))
        secs = np.sort(secs)
        if len(secs) > 1:
            d = np.diff(secs)
            mean_gap, max_gap = float(d.mean()), float(d.max())
            if ndigits is not None:
                mean_gap = float(round_sql_np(round_sql_np(mean_gap, 9), ndigits))
                max_gap = float(round_sql_np(round_sql_np(max_gap, 9), ndigits))
        else:
            mean_gap = max_gap = None
        return pa.table(
            {
                key: g[key].slice(0, 1).combine_chunks(),
                "n_events": pa.array([len(secs)], pa.int64()),
                "mean_gap_s": pa.array([mean_gap], pa.float64()),
                "max_gap_s": pa.array([max_gap], pa.float64()),
            }
        )

    return ds.groupby(key).map_groups(gaps, batch_format="pyarrow")


def sessionize(ds, options: dict, ctx=None):
    """Per-event session assignment: a new session starts whenever the gap
    from the key's previous event exceeds ``gap_s`` (the classic 30-min
    inactivity rule; the per-EVENT counterpart of the session WINDOW
    aggregate in stages/window.py).

    {"type": "sessionize", "group_by": "user_id", "ts_field": "ts",
     "gap_s": 1800, "target": "session_id"}

    One hash shuffle on the key; each group argsorts its timestamps once
    and labels sessions with a vectorized diff + cumsum (0-based within
    the key). Tied timestamps have gap 0, so labels are deterministic
    regardless of tie order — the same property the SQL-window oracle
    relies on. All input columns pass through untouched.

    Partitioning assumption (same as SQL PARTITION BY): one key's
    rows fit one worker; a key past ``max_group_rows`` raises with the
    mitigation (pre-split by calendar day, sessionize within splits,
    merge boundary sessions) instead of silently OOMing the worker."""
    key = options["group_by"]
    ts_field = options.get("ts_field", "ts")
    gap_s = float(options.get("gap_s", 1800.0))
    target = options.get("target", "session_id")
    max_group_rows = int(options.get("max_group_rows", 10_000_000))
    if max_group_rows <= 0:
        raise ValueError("sessionize: max_group_rows must be positive")

    def label(g: pa.Table) -> pa.Table:
        if g.num_rows > max_group_rows:
            raise ValueError(
                f"sessionize: key group has {g.num_rows} rows, exceeding "
                f"max_group_rows={max_group_rows}. Pre-split the hot key "
                "by calendar day (tumbling window on the event ts), "
                "sessionize within each split, and merge boundary "
                "sessions whose gap spans the split edge; or raise "
                "max_group_rows if worker memory allows."
            )
        ts = g[ts_field]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if pa.types.is_timestamp(ts.type):
            unit = {"s": 1.0, "ms": 1e3, "us": 1e6, "ns": 1e9}[ts.type.unit]
            secs = np.asarray(pc.cast(ts, pa.int64())) / unit
        else:
            secs = np.asarray(pc.cast(ts, pa.float64()))
        order = np.argsort(secs, kind="stable")
        sid = np.zeros(len(secs), dtype=np.int64)
        if len(secs) > 1:
            sid[order[1:]] = np.cumsum(np.diff(secs[order]) > gap_s)
        return g.append_column(target, pa.array(sid, pa.int64()))

    return ds.groupby(key).map_groups(label, batch_format="pyarrow")


def _sortable(col) -> np.ndarray:
    """Order-preserving numpy sort key for a column (timestamps → int64,
    strings → dense rank so numpy can lexsort null-bearing text)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(col.type):
        return np.asarray(pc.cast(col, pa.int64()))
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return np.asarray(
            pc.rank(
                col,
                sort_keys="ascending",
                null_placement="at_end",
                tiebreaker="dense",
            )
        )
    return np.asarray(col)


def cumulative(ds, options: dict, ctx=None):
    """Per-key running window aggregates: row_number and cumulative sum of
    a value field, ordered by an explicit (deterministic) sort-key list.

    {"type": "cumulative", "group_by": "user_id",
     "order_by": ["ts", "event_id"], "field": "value",
     "round": 4}

    One hash shuffle on the key; each group lexsorts once and runs
    vectorized cumsum — the running-total order matches SQL's sequential
    window accumulation, so sums agree bit-for-bit modulo the documented
    double-round. ``order_by`` must make rows unique within a key (pass a
    unique id as the last column) or running sums are not well-defined.

    Partitioning assumption (same as SQL PARTITION BY): one key's
    rows fit one worker; a pathologically hot key becomes a straggler
    (pre-split upstream or salt if a key can exceed worker memory)."""
    from vector_ray.schema import round_sql_np

    key = options["group_by"]
    order_by = options["order_by"]
    field = options["field"]
    ndigits = options.get("round")

    def running(g: pa.Table) -> pa.Table:
        # np.lexsort: last key is primary
        keys = [_sortable(g[c]) for c in reversed(order_by)]
        order = np.lexsort(keys)
        vals = np.asarray(
            pc.cast(
                g[field].combine_chunks()
                if isinstance(g[field], pa.ChunkedArray)
                else g[field],
                pa.float64(),
            )
        )
        csum = np.cumsum(vals[order])
        if ndigits is not None:
            csum = round_sql_np(round_sql_np(csum, 9), ndigits)
        rn = np.empty(len(order), dtype=np.int64)
        rn[order] = np.arange(1, len(order) + 1)
        out = np.empty(len(order), dtype=np.float64)
        out[order] = csum
        return g.append_column("rn", pa.array(rn, pa.int64())).append_column(
            f"cum_{field}", pa.array(out, pa.float64())
        )

    return ds.groupby(key).map_groups(running, batch_format="pyarrow")


def moving(ds, options: dict, ctx=None):
    """Per-key bounded TRAILING-window aggregate — SQL
    ``fn(value) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN n-1
    PRECEDING AND CURRENT ROW)`` — the moving-average / rolling-min
    family ``cumulative`` (unbounded) doesn't cover.

    {"type": "moving", "group_by": "user_id",
     "order_by": ["ts", "event_id"], "field": "value", "n": 5,
     "fn": "mean", "round": 4}

    fn ∈ sum | mean | min | max. One hash shuffle on the key; per
    group one lexsort, then sum/mean via cumsum difference (O(rows))
    and min/max via a sliding-window view (O(rows × n) compare — keep
    ``n`` modest). Same partitioning assumption and deterministic
    ``order_by`` contract as ``cumulative``."""
    from vector_ray.schema import round_sql_np

    key = options["group_by"]
    order_by = options["order_by"]
    field = options["field"]
    n = int(options["n"])
    fn = options.get("fn", "mean")
    ndigits = options.get("round")
    if fn not in ("sum", "mean", "min", "max"):
        raise ValueError(f"moving: fn must be sum|mean|min|max, got {fn!r}")
    if n < 1:
        raise ValueError("moving: n must be >= 1")

    def window(g: pa.Table) -> pa.Table:
        keys = [_sortable(g[c]) for c in reversed(order_by)]
        order = np.lexsort(keys)
        col = g[field]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)[order]
        # SQL window aggregates IGNORE nulls: they contribute nothing to
        # sum/min/max and don't count toward the mean divisor; a window
        # whose values are ALL null yields NULL. (A null fed into the
        # cumsum-difference would otherwise poison every later row.)
        isnull = np.asarray(pc.is_null(col))[order]
        m = len(vals)
        lo = np.maximum(np.arange(m) - n + 1, 0)
        hi = np.arange(1, m + 1)
        ccnt = np.concatenate([[0.0], np.cumsum((~isnull).astype(np.float64))])
        k = ccnt[hi] - ccnt[lo]
        if fn in ("sum", "mean"):
            csum = np.concatenate(
                [[0.0], np.cumsum(np.where(isnull, 0.0, vals))]
            )
            agg = csum[hi] - csum[lo]
            if fn == "mean":
                with np.errstate(invalid="ignore", divide="ignore"):
                    agg = agg / k
        else:
            red = np.minimum if fn == "min" else np.maximum
            sentinel = np.inf if fn == "min" else -np.inf
            filled = np.where(isnull, sentinel, vals)
            if m >= n:
                sw = np.lib.stride_tricks.sliding_window_view(filled, n)
                full = red.reduce(sw, axis=1)
            else:
                full = np.empty(0, np.float64)
            head = red.accumulate(filled[: min(m, n - 1)])
            agg = np.concatenate([head, full])
        agg = np.where(k > 0, agg, np.nan)  # all-null window -> SQL NULL
        if ndigits is not None:
            agg = round_sql_np(round_sql_np(agg, 9), ndigits)
        out = np.empty(m, dtype=np.float64)
        out[order] = agg
        return g.append_column(
            f"mov_{fn}_{field}",
            pa.array(out, pa.float64(), from_pandas=True),  # NaN -> null
        )

    return ds.groupby(key).map_groups(window, batch_format="pyarrow")


def ewma(ds, options: dict, ctx=None):
    """Per-key exponentially-weighted moving average — the recursive
    smoother y_0 = x_0, y_t = alpha*x_t + (1-alpha)*y_{t-1} over each
    key's rows in ``order_by`` order. This is the telemetry
    baseline/anomaly primitive that ``moving``'s bounded frame can't
    express: every past row contributes, geometrically decayed.

    {"type": "ewma", "group_by": "user_id",
     "order_by": ["ts", "event_id"], "field": "value",
     "alpha": 0.3, "round": 4}

    The recurrence is inherently sequential per key, so the stage
    buckets KEYS (``hash_bucket``), not rows: one shuffle on the bucket
    id, then inside each bucket one lexsort by (key, order_by...) and a
    step loop of length max-rows-per-key where step k updates the k-th
    row of EVERY key's sequence in one numpy expression. Python-level
    work is O(longest sequence), not O(rows) — ten thousand keys of
    length 100 cost 100 vector steps, not a million iterations.

    Every step is pinned to 9 decimals (round_sql_np) so the result is
    bit-reproducible regardless of partitioning and matches a recursive
    SQL oracle that rounds identically per step (the same pinning trick
    the logreg/pagerank oracles use). A null input value yields a null
    smoothed value and poisons the rest of that key's tail, exactly like
    the SQL recurrence (NULL propagates through arithmetic). All input
    columns pass through; the smoothed value lands in ``ewma_<field>``.

    Partitioning assumption: one BUCKET of keys fits one worker
    (``num_buckets`` sizes this — raise it for huge key spaces); within
    a key, ``order_by`` must be a deterministic total order (end it
    with a unique id)."""
    from vector_ray.schema import round_sql_np
    from vector_ray.stages import shuffle as _shuffle

    key = options["group_by"]
    order_by = options["order_by"]
    field = options["field"]
    alpha = float(options.get("alpha", 0.3))
    ndigits = options.get("round")
    num_buckets = int(options.get("num_buckets", 64))
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"ewma: alpha must be in (0, 1], got {alpha}")
    beta = 1.0 - alpha

    def smooth(g: pa.Table) -> pa.Table:
        g = g.drop_columns([_shuffle.BUCKET_COLUMN])
        kcol = _sortable(g[key])
        keys = [_sortable(g[c]) for c in reversed(order_by)]
        keys.append(kcol)  # primary sort key: the entity
        order = np.lexsort(keys)
        col = g[field]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        x = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)[order]
        ks = kcol[order]
        m = len(x)
        starts = np.flatnonzero(
            np.concatenate([[True], ks[1:] != ks[:-1]])
        ) if m else np.empty(0, np.int64)
        lens = np.diff(np.concatenate([starts, [m]]))
        y = np.empty(m, dtype=np.float64)
        y[starts] = round_sql_np(x[starts], 9)
        for k in range(1, int(lens.max()) if m else 0):
            sel = starts[lens > k] + k
            y[sel] = round_sql_np(alpha * x[sel] + beta * y[sel - 1], 9)
        if ndigits is not None:
            y = round_sql_np(round_sql_np(y, 9), ndigits)
        out = np.empty(m, dtype=np.float64)
        out[order] = y
        return g.append_column(
            f"ewma_{field}", pa.array(out, pa.float64(), from_pandas=True)
        )

    bucketed = _shuffle.hash_bucket(ds, key, num_buckets)
    return bucketed.groupby(_shuffle.BUCKET_COLUMN).map_groups(
        smooth, batch_format="pyarrow"
    )


def cusum(ds, options: dict, ctx=None):
    """Per-key one-sided CUSUM changepoint score — the classic
    upward-shift detector: s_t = max(0, s_{t-1} + (x_t - target -
    slack)), flagged when s crosses ``threshold``. The alerting
    primitive on top of which ``ewma``'s smoother is the baseline.

    {"type": "cusum", "group_by": "user_id",
     "order_by": ["ts", "event_id"], "field": "value",
     "target": 50.0, "slack": 5.0, "threshold": 25.0, "round": 4}

    A null value resets the score to 0 for that row (SQL
    GREATEST(0.0, NULL) semantics) and the recurrence continues.

    Same execution shape as ``ewma`` (the recurrence is sequential per
    key): keys are hash-bucketed, one lexsort per bucket, then a step
    loop vectorized across every key in the bucket. Each step is
    pinned to 9 decimals so a recursive SQL oracle reproduces it
    bit-for-bit. ``target``/``slack`` are explicit constants (not a
    computed mean) so both sides subtract identical doubles; the
    drift is computed as (x - target) - slack, matching SQL's
    left-associative ``x - t - s``. Output columns: ``cusum_<field>``
    and ``alert_<field>`` (0/1)."""
    from vector_ray.schema import round_sql_np
    from vector_ray.stages import shuffle as _shuffle

    key = options["group_by"]
    order_by = options["order_by"]
    field = options["field"]
    target = float(options["target"])
    slack = float(options.get("slack", 0.0))
    threshold = float(options["threshold"])
    ndigits = options.get("round")
    num_buckets = int(options.get("num_buckets", 64))

    def scan(g: pa.Table) -> pa.Table:
        g = g.drop_columns([_shuffle.BUCKET_COLUMN])
        kcol = _sortable(g[key])
        keys = [_sortable(g[c]) for c in reversed(order_by)]
        keys.append(kcol)
        order = np.lexsort(keys)
        col = g[field]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        x = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)[order]
        d = (x - target) - slack
        ks = kcol[order]
        m = len(x)
        starts = np.flatnonzero(
            np.concatenate([[True], ks[1:] != ks[:-1]])
        ) if m else np.empty(0, np.int64)
        lens = np.diff(np.concatenate([starts, [m]]))
        # np.fmax (not maximum): fmax(0, NaN) = 0.0, matching SQL
        # GREATEST(0.0, NULL) = 0.0 — a null value RESETS the score
        # instead of poisoning the key's tail
        s = np.empty(m, dtype=np.float64)
        s[starts] = round_sql_np(np.fmax(0.0, d[starts]), 9)
        for k in range(1, int(lens.max()) if m else 0):
            sel = starts[lens > k] + k
            s[sel] = round_sql_np(np.fmax(0.0, s[sel - 1] + d[sel]), 9)
        if ndigits is not None:
            s = round_sql_np(round_sql_np(s, 9), ndigits)
        out = np.empty(m, dtype=np.float64)
        out[order] = s
        alert = (out > threshold).astype(np.int64)
        return g.append_column(
            f"cusum_{field}", pa.array(out, pa.float64(), from_pandas=True)
        ).append_column(f"alert_{field}", pa.array(alert, pa.int64()))

    bucketed = _shuffle.hash_bucket(ds, key, num_buckets)
    return bucketed.groupby(_shuffle.BUCKET_COLUMN).map_groups(
        scan, batch_format="pyarrow"
    )


def coalesce_intervals(ds, options: dict, ctx=None):
    """Per-key interval coalescing: merge overlapping-or-touching
    [start, end] spans into maximal covered ranges — the gap/uptime
    primitive (turn raw request spans into busy periods, alert windows
    into incidents).

    {"type": "coalesce_intervals", "group_by": "user_id",
     "start_field": "s", "end_field": "e", "round": 6}

    One hash shuffle on the key; each group lexsorts by (start, end)
    once, computes the running max of prior ends (one cummax), and
    starts a new span exactly where start > that running max — the
    same rule as the SQL window formulation (MAX(end) OVER preceding
    rows), so results match bit-for-bit on identical input doubles.
    Output per merged span: key, span_start, span_end, n_merged.

    Partitioning assumption (same as SQL PARTITION BY): one key's
    rows fit one worker; a pathologically hot key becomes a straggler
    (pre-split upstream or salt if a key can exceed worker memory)."""
    from vector_ray.schema import round_sql_np

    key = options["group_by"]
    start_field = options["start_field"]
    end_field = options["end_field"]
    ndigits = options.get("round")

    def merge(g: pa.Table) -> pa.Table:
        def col(name):
            c = g[name]
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            return pc.cast(c, pa.float64()).to_numpy(zero_copy_only=False)

        s, e = col(start_field), col(end_field)
        order = np.lexsort((e, s))
        s, e = s[order], e[order]
        m = len(s)
        run_max = np.maximum.accumulate(e)
        new = np.ones(m, dtype=bool)
        if m > 1:
            new[1:] = s[1:] > run_max[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.concatenate([starts, [m]]))
        span_start = s[starts]
        span_end = np.maximum.reduceat(e, starts) if m else e
        if ndigits is not None:
            span_start = round_sql_np(round_sql_np(span_start, 9), ndigits)
            span_end = round_sql_np(round_sql_np(span_end, 9), ndigits)
        kcol = g[key]
        kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) else kcol
        return pa.table(
            {
                key: pa.concat_arrays(
                    [kcol.slice(0, 1)] * len(starts)
                ) if len(starts) else kcol.slice(0, 0),
                "span_start": pa.array(span_start, pa.float64()),
                "span_end": pa.array(span_end, pa.float64()),
                "n_merged": pa.array(counts, pa.int64()),
            }
        )

    return ds.groupby(key).map_groups(merge, batch_format="pyarrow")


def robust_z(ds, options: dict, ctx=None):
    """Per-key ROBUST z-score: (x - median) / (1.4826 * MAD), the
    outlier score that a handful of extreme values can't poison the
    way mean/stddev z-scores (``zscore``) can. 1.4826 is the standard
    consistency constant that makes MAD estimate sigma under normality.

    {"type": "robust_z", "group_by": "event_type", "field": "value",
     "target": "robust_z", "round": 4}

    One hash shuffle on the key; each group computes median and MAD
    with two np.quantile calls (linear interpolation == SQL
    quantile_cont) and scores all its rows vectorized. An all-constant
    key (MAD = 0) yields NULL, matching SQL x/0.0. All input columns
    pass through.

    Partitioning assumption (same as SQL PARTITION BY): one key's
    rows fit one worker; a pathologically hot key becomes a straggler
    (pre-split upstream or salt if a key can exceed worker memory)."""
    from vector_ray.schema import round_sql_np

    key = options["group_by"]
    field = options["field"]
    target = options.get("target", "robust_z")
    ndigits = options.get("round")

    def score(g: pa.Table) -> pa.Table:
        col = g[field]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        x = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
        # median/MAD over NON-NULL values only, like SQL quantile_cont
        # (one null row must not poison the whole key); null rows still
        # score null via NaN propagation
        valid = ~np.isnan(x)
        if not valid.any():
            z = np.full(len(x), np.nan)
        else:
            med = np.quantile(x[valid], 0.5)
            mad = np.quantile(np.abs(x[valid] - med), 0.5)
            if mad == 0.0:
                z = np.full(len(x), np.nan)
            else:
                z = (x - med) / (1.4826 * mad)
                if ndigits is not None:
                    z = round_sql_np(round_sql_np(z, 9), ndigits)
        return g.append_column(
            target, pa.array(z, pa.float64(), from_pandas=True)
        )

    return ds.groupby(key).map_groups(score, batch_format="pyarrow")


def group_normalize(ds, options: dict, ctx=None):
    """Group-relative reward normalization (the GRPO/RLOO advantage
    step): z = (x − mean_group) / stddev_group, computed within each
    key group. Post-training pipelines whiten per-prompt reward pools
    this way before policy optimization so a generous prompt's rewards
    don't dominate the gradient.

    {"type": "group_normalize", "group_by": "prompt_id",
     "field": "reward", "target": "advantage", "round": 6,
     "num_buckets": 64}

    One hash shuffle of the rows, bucket-vectorized: keys are hashed
    into ``num_buckets`` worker-sized buckets and each bucket resolves
    ALL its groups with one lexsort + reduceat — no per-group Python.
    Stats use STDDEV_SAMP over non-null values (SQL semantics: a null
    reward scores null without poisoning its group; a group with < 2
    non-null rewards, or zero spread, scores null; null KEYS form one
    group together, like SQL PARTITION BY). All input columns pass
    through.

    Partitioning assumption: one BUCKET of groups fits one worker
    (``num_buckets`` sizes this), not one group per worker."""
    from vector_ray.schema import round_sql_np
    from vector_ray.stages import shuffle as _shuffle

    key = options["group_by"]
    field = options["field"]
    target = options.get("target", "advantage")
    ndigits = options.get("round")
    num_buckets = int(options.get("num_buckets", 64))

    def normalize(g: pa.Table) -> pa.Table:
        g = g.drop_columns([_shuffle.BUCKET_COLUMN])
        col = g[field]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        x = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
        # dense rank as the run key for EVERY key type: null-safe (all
        # null keys share one rank, grouping together like SQL
        # PARTITION BY) where a raw int→float cast would make each null
        # a NaN singleton
        kcol = g[key]
        kcol = (
            kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) else kcol
        )
        k = np.asarray(
            pc.rank(
                kcol,
                sort_keys="ascending",
                null_placement="at_end",
                tiebreaker="dense",
            )
        )
        order = np.lexsort((k,))
        ks = k[order]
        xs = x[order]
        m = len(xs)
        starts = np.flatnonzero(
            np.concatenate([[True], ks[1:] != ks[:-1]])
        ) if m else np.empty(0, np.int64)
        run_of = np.cumsum(
            np.concatenate([[False], ks[1:] != ks[:-1]])
        ) if m else np.empty(0, np.int64)
        valid = ~np.isnan(xs)
        xv = np.where(valid, xs, 0.0)
        n = np.add.reduceat(valid.astype(np.int64), starts) if m else starts
        s = np.add.reduceat(xv, starts) if m else starts.astype(float)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s / n
            # numerically stable two-pass sample variance: a second
            # reduceat over Σ(x−mean)² — the one-pass Σx²−n·mean² form
            # cancels catastrophically at large magnitudes (std 1.63 vs
            # true 1.29 at mean 1e8) and SQL's Welford does not
            d = np.where(valid, xs - mean[run_of], 0.0)
            q = np.add.reduceat(d * d, starts) if m else starts.astype(float)
            std = np.sqrt(q / (n - 1))
            std = np.where(std == 0.0, np.nan, std)
            z = (xs - mean[run_of]) / std[run_of]
        if ndigits is not None:
            z = round_sql_np(round_sql_np(z, 9), ndigits)
        out = np.empty(m, dtype=np.float64)
        out[order] = z
        return g.append_column(
            target, pa.array(out, pa.float64(), from_pandas=True)
        )

    bucketed = _shuffle.hash_bucket(ds, key, num_buckets)
    return bucketed.groupby(_shuffle.BUCKET_COLUMN).map_groups(
        normalize, batch_format="pyarrow"
    )


def transitions(ds, options: dict, ctx=None):
    """Per-key event-SEQUENCE transition counts: how often does state A
    immediately precede state B in a key's ordered stream — the Markov
    edge list behind journey analytics and next-event prediction.

    {"type": "transitions", "group_by": "user_id",
     "order_by": ["ts", "event_id"], "state_field": "event_type"}

    One hash shuffle on the key; each group lexsorts once, pairs each
    row's state with its successor via one shifted compare, and emits
    per-group (src, dst, n) partials; the global two-phase count then
    sums tiny partial rows. ``order_by`` must totally order rows within
    a key (end it with a unique id) or the pairing is ill-defined.

    Partitioning assumption (same as SQL PARTITION BY): one key's rows
    fit one worker."""
    key = options["group_by"]
    order_by = options["order_by"]
    state_field = options.get("state_field", "event_type")

    def pairs(g: pa.Table) -> pa.Table:
        keys = [_sortable(g[c]) for c in reversed(order_by)]
        order = np.lexsort(keys)
        col = g[state_field]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        states = col.take(pa.array(order))
        m = len(states)
        if m < 2:
            return pa.table(
                {
                    "src": states.slice(0, 0),
                    "dst": states.slice(0, 0),
                    "n": pa.array([], pa.int64()),
                }
            )
        src = states.slice(0, m - 1)
        dst = states.slice(1)
        # per-group combiner: count distinct (src, dst) pairs locally
        part = (
            pa.table({"src": src, "dst": dst})
            .group_by(["src", "dst"])
            .aggregate([([], "count_all")])
        )
        return part.rename_columns(["src", "dst", "n"])

    partials = ds.groupby(key).map_groups(pairs, batch_format="pyarrow")
    return aggregate(
        partials,
        {
            "group_by": ["src", "dst"],
            "aggregates": {"n": {"fn": "sum", "field": "n", "int": True}},
        },
    )


def retention(ds, options: dict, ctx=None):
    """Cohort retention — for each entity cohort (the period of its
    FIRST event) count how many entities were active again k periods
    later. The product-analytics companion to ``funnel``/``sessionize``.

    {"type": "retention", "group_by": "user_id", "ts_field": "ts",
     "unit": "day"}

    Plan: one hash shuffle on the entity key; each group computes its
    own cohort (min timestamp, floored to the unit) and emits ONE row
    per distinct (cohort, period) it was active in — a per-group exact
    distinct, so the final count is a plain two-phase COUNT over rows
    that already shrank to ≤ active-periods-per-entity. No join, no
    broadcast, nothing driver-side; skew-safe because per-entity groups
    are small and the (cohort, period) aggregate uses partial counts.

    ``unit``: "day" | "week" (ISO weeks, floored to Monday like SQL
    date_trunc('week')). Output: cohort (the unit's start date as
    'YYYY-MM-DD'), period (integer units since the cohort), n_users."""
    key = options.get("group_by", "user_id")
    ts_field = options.get("ts_field", "ts")
    unit = options.get("unit", "day")
    if unit not in ("day", "week"):
        raise ValueError(f"retention: unit must be day|week, got {unit!r}")

    def per_entity(g: pa.Table) -> pa.Table:
        ts = g[ts_field]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if pa.types.is_timestamp(ts.type):
            div = {"s": 86400, "ms": 86400_000, "us": 86400_000_000,
                   "ns": 86400_000_000_000}[ts.type.unit]
            days = np.asarray(pc.cast(ts, pa.int64())) // div
        else:  # already an epoch-seconds number
            days = (
                np.asarray(pc.cast(ts, pa.int64())) // 86400
            )
        if unit == "week":
            # epoch day 0 = Thursday; Monday floor like date_trunc('week')
            days = days - (days + 3) % 7
            span = 7
        else:
            span = 1
        c = days.min()
        periods = np.unique((days - c) // span)
        cohort = str(np.datetime64(int(c), "D"))
        return pa.table(
            {
                "cohort": pa.array([cohort] * len(periods), pa.string()),
                "period": pa.array(periods, pa.int64()),
            }
        )

    active = ds.groupby(key).map_groups(per_entity, batch_format="pyarrow")
    return aggregate(
        active,
        {
            "group_by": ["cohort", "period"],
            "aggregates": {"n_users": {"fn": "count"}},
        },
    )


def decay(ds, options: dict, ctx=None):
    """Per-key exponentially TIME-decayed sum/count as of a reference
    instant — the "what matters now" aggregate (recent events count
    fully, old ones fade with a configurable half-life). The batch
    counterpart of a streaming decayed counter: recomputable from the
    log at any ``ref_ts``, so no mutable state is needed.

    {"type": "decay", "group_by": "event_type", "ts_field": "ts",
     "field": "value", "ref_ts": "2024-02-01 00:00:00",
     "halflife_s": 604800, "round": 4}

    Per batch (embarrassingly parallel): weight w = exp(-age_s * λ)
    with λ = ln2/halflife, each per-row term pinned to 9 decimals;
    then the normal two-phase aggregate sums the tiny per-key
    partials. Output per key: decayed_sum (Σ value·w), decayed_n
    (Σ w — the decayed event count).

    Epoch seconds are computed as int64(µs)/1e6, bit-identical to SQL
    epoch(ts); the pinned per-row terms make the result partition-
    invariant up to double summation order (the same contract every
    SUM aggregate here has)."""
    import datetime as _dt

    from vector_ray.schema import round_sql_np

    key = options["group_by"]
    ts_field = options.get("ts_field", "ts")
    field = options["field"]
    ref_ts = options["ref_ts"]
    halflife_s = float(options["halflife_s"])
    ndigits = options.get("round")
    if halflife_s <= 0:
        raise ValueError(f"decay: halflife_s must be > 0, got {halflife_s}")
    lam = float(np.log(2.0)) / halflife_s
    # naive timestamps are UTC, like SQL epoch(TIMESTAMP '...')
    ref_s = (
        _dt.datetime.fromisoformat(ref_ts)
        .replace(tzinfo=_dt.timezone.utc)
        .timestamp()
        if isinstance(ref_ts, str)
        else float(ref_ts)
    )

    def weigh(t: pa.Table) -> pa.Table:
        ts = t[ts_field]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if pa.types.is_timestamp(ts.type):
            div = {"s": 1.0, "ms": 1e3, "us": 1e6, "ns": 1e9}[ts.type.unit]
            secs = np.asarray(pc.cast(ts, pa.int64())) / div
        else:
            secs = np.asarray(pc.cast(ts, pa.float64()))
        w = np.exp(-(ref_s - secs) * lam)
        vals = t[field]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        v = pc.cast(vals, pa.float64()).to_numpy(zero_copy_only=False)
        kcol = t[key]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        return pa.table(
            {
                key: kcol,
                "__dv": pa.array(round_sql_np(v * w, 9), pa.float64()),
                "__dw": pa.array(round_sql_np(w, 9), pa.float64()),
            }
        )

    weighted = ds.map_batches(weigh, batch_format="pyarrow")
    spec = {
        "group_by": [key] if isinstance(key, str) else list(key),
        "aggregates": {
            "decayed_sum": {"fn": "sum", "field": "__dv"},
            "decayed_n": {"fn": "sum", "field": "__dw"},
        },
    }
    if ndigits is not None:
        spec["round"] = ndigits
    return aggregate(weighted, spec)


def rollup(ds, options: dict, ctx=None):
    """Multi-level (SQL ROLLUP) aggregation in ONE pass over the data:
    the finest level runs the normal two-phase aggregate; every coarser
    level re-aggregates the (tiny) finest-level table, never the input.

    {"type": "rollup", "group_by": ["source", "event_type"],
     "aggregates": {"n": {"fn": "count"}, "total": {"fn": "sum",
                    "field": "value"}}, "round": 4}

    Output = union of len(group_by)+1 levels; dropped key columns are
    NULL, exactly like ``GROUP BY ROLLUP``. Supported fns: the
    re-aggregatable family sum / count / min / max / mean (mean carries
    internal sum+count through the levels). Quantile/distinct fns are
    not decomposable across levels — use ``aggregate`` per level.

    ``mode``: "rollup" (default, prefix hierarchy) | "cube" (every key
    subset, 2^k levels) | "sets" with an explicit ``sets`` list of key
    subsets (SQL GROUPING SETS; the finest level is always included as
    the re-aggregation base)."""
    group_by = list(options["group_by"])
    aggregates = dict(options["aggregates"])
    ndigits = options.get("round")

    _REAGG = {"sum", "count", "min", "max", "mean"}
    bad = {o: s["fn"] for o, s in aggregates.items() if s["fn"] not in _REAGG}
    if bad:
        raise ValueError(f"rollup supports {sorted(_REAGG)}; got {bad}")

    # finest level with mean decomposed into internal sum + count
    base_aggs: dict = {}
    for out, spec in aggregates.items():
        if spec["fn"] == "mean":
            base_aggs[f"__rs_{out}"] = {"fn": "sum", "field": spec["field"]}
            base_aggs[f"__rc_{out}"] = {"fn": "count"}
        else:
            base_aggs[out] = spec
    # materialize the finest level ONCE: every coarser level re-reads it,
    # and a lazy base would re-execute the full input scan per level
    # (measured 11.7s -> ~3s for a 2-key CUBE at sf0.1). The base is one
    # row per key combination — tiny by construction.
    base = aggregate(
        ds, {"group_by": group_by, "aggregates": base_aggs}
    ).materialize()
    # capture key dtypes ONCE on the driver (a Dataset must never ride
    # into a map_batches closure)
    in_schema = ds.schema()
    key_types = {k: in_schema.base_schema.field(k).type for k in group_by}

    def finish_level(t: pa.Table, present: list[str]) -> pa.Table:
        cols: dict = {}
        for k in group_by:
            if k in present:
                cols[k] = t[k]
            else:
                # typed nulls so the union of levels has ONE schema
                cols[k] = pa.nulls(t.num_rows, key_types[k])
        for out, spec in aggregates.items():
            if spec["fn"] == "mean":
                v = pc.divide(
                    pc.cast(t[f"__rs_{out}"], pa.float64()),
                    pc.cast(t[f"__rc_{out}"], pa.float64()),
                )
            else:
                v = t[out]
                if spec["fn"] == "count" or spec.get("int"):
                    v = pc.cast(v, pa.int64())
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            cols[out] = v
        out_t = pa.table(cols)
        if ndigits is not None:
            from vector_ray.schema import round_sql

            for out, spec in aggregates.items():
                if pa.types.is_floating(out_t.schema.field(out).type):
                    i = out_t.column_names.index(out)
                    out_t = out_t.set_column(
                        i, out, round_sql(round_sql(out_t[out], 9), ndigits)
                    )
        return out_t

    mode = options.get("mode", "rollup")
    emit_finest = True
    if mode == "rollup":
        key_sets = [group_by[:d] for d in range(len(group_by) - 1, -1, -1)]
    elif mode == "cube":
        from itertools import combinations

        key_sets = [
            list(c)
            for r in range(len(group_by) - 1, -1, -1)
            for c in combinations(group_by, r)
        ]
    elif mode == "sets":
        requested = [list(s) for s in options["sets"]]
        for s in requested:
            unknown = [k for k in s if k not in group_by]
            if unknown:
                raise ValueError(f"grouping set {s} has non-key columns {unknown}")
        # the full key set is always COMPUTED (it is the re-aggregation
        # base) but only EMITTED when requested
        if not requested:
            raise ValueError("mode='sets' requires a non-empty sets list")
        emit_finest = any(set(s) == set(group_by) for s in requested)
        key_sets = [s for s in requested if set(s) != set(group_by)]
    else:
        raise ValueError(f"unknown rollup mode {mode!r}")

    # fast path: with a small finest level (the common case — the base is
    # one row per key combination), coarser levels are pure Arrow math on
    # the driver — one table concat instead of N Ray groupby jobs
    # (measured: 2-key CUBE at sf0.1 drops 4.4s -> ~base-aggregate cost).
    max_driver_rows = int(options.get("max_driver_rows", 1_000_000))
    n_base = base.count()
    if n_base <= max_driver_rows:
        import ray as _ray

        base_t = pa.concat_tables(
            _ray.get(base.to_arrow_refs()), promote_options="default"
        ).combine_chunks()
        if base_t.num_rows == 0:
            # empty input (Ray represents empty blocks with no columns):
            # emit the finished schema with zero rows, like the keyed SQL
            # grouping sets on an empty table
            cols: dict = {k: pa.nulls(0, key_types[k]) for k in group_by}
            for out, spec in aggregates.items():
                fn = spec["fn"]
                if fn == "count":
                    typ = pa.int64()
                elif fn == "mean":
                    typ = pa.float64()
                elif fn == "sum":
                    typ = pa.int64() if spec.get("int") else pa.float64()
                else:
                    typ = in_schema.base_schema.field(spec["field"]).type
                cols[out] = pa.nulls(0, typ)
            import ray.data as _rd

            return _rd.from_arrow(pa.table(cols))
        parts = []
        if emit_finest:
            parts.append(finish_level(base_t, group_by))
        agg_cols = []
        for out, spec in aggregates.items():
            fn = spec["fn"]
            if fn == "mean":
                agg_cols += [(f"__rs_{out}", "sum"), (f"__rc_{out}", "sum")]
            elif fn in ("sum", "count"):
                agg_cols.append((out, "sum"))
            else:
                agg_cols.append((out, fn))
        orig_names = [c for c, _ in agg_cols]
        for present in key_sets:
            if present:
                lvl_t = base_t.group_by(present).aggregate(agg_cols)
                lvl_t = lvl_t.rename_columns(present + orig_names)
            else:
                lvl_t = _fold_total(base_t, aggregates)
            parts.append(finish_level(lvl_t, present))
        import ray.data as _rd

        return _rd.from_arrow(pa.concat_tables(parts))

    levels = []
    if emit_finest:
        levels.append(base.map_batches(
            lambda t: finish_level(t, group_by), batch_format="pyarrow"
        ))
    for present in key_sets:
        re_aggs = []
        for out, spec in aggregates.items():
            fn = spec["fn"]
            if fn == "mean":
                re_aggs.append(Sum(f"__rs_{out}", alias_name=f"__rs_{out}"))
                re_aggs.append(Sum(f"__rc_{out}", alias_name=f"__rc_{out}"))
            elif fn in ("sum", "count"):
                re_aggs.append(Sum(out, alias_name=out))
            elif fn == "min":
                re_aggs.append(Min(out, alias_name=out))
            elif fn == "max":
                re_aggs.append(Max(out, alias_name=out))
        if present:
            lvl = base.groupby(present).aggregate(*re_aggs)
        else:
            lvl = base.groupby(group_by[:1]).aggregate(*re_aggs)
            # grand total: one more fold over the per-key rows (tiny)
            lvl = lvl.map_batches(
                lambda t: _fold_total(t, aggregates), batch_format="pyarrow"
            ).repartition(1).map_batches(
                lambda t: _fold_total(t, aggregates), batch_format="pyarrow"
            )
        levels.append(lvl.map_batches(
            lambda t, p=tuple(present): finish_level(t, list(p)),
            batch_format="pyarrow",
        ))
    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def _fold_total(t: pa.Table, aggregates: dict) -> pa.Table:
    if t.num_rows == 0:
        return t.select([c for c in t.column_names if c != "__none"])
    cols: dict = {}
    for out, spec in aggregates.items():
        fn = spec["fn"]
        if fn == "mean":
            cols[f"__rs_{out}"] = pa.array([pc.sum(t[f"__rs_{out}"]).as_py()])
            cols[f"__rc_{out}"] = pa.array(
                [pc.sum(t[f"__rc_{out}"]).as_py()], pa.int64()
            )
        elif fn in ("sum", "count"):
            cols[out] = pa.array([pc.sum(t[out]).as_py()], t.schema.field(out).type)
        elif fn == "min":
            cols[out] = pa.array([pc.min(t[out]).as_py()], t.schema.field(out).type)
        elif fn == "max":
            cols[out] = pa.array([pc.max(t[out]).as_py()], t.schema.field(out).type)
    return pa.table(cols)


def pivot(ds, options: dict, ctx=None):
    """Categorical pivot to wide columns — the feature-engineering shape
    (one row per key, one count/sum column per category value).

    {"type": "pivot", "group_by": "user_id", "pivot": "event_type",
     "values": ["view", "click", "purchase"], "fn": "count",
     "field": null, "prefix": "n_"}

    Two-phase like ``aggregate``: per-batch vectorized indicator sums
    (one row per key per batch) then a tiny groupby Sum — the category
    list must be explicit (bounded output schema; discover it first with
    ``distinct`` if unknown)."""
    key = options["group_by"]
    pivot_col = options["pivot"]
    values = list(options["values"])
    fn = options.get("fn", "count")
    field = options.get("field")
    prefix = options.get("prefix", "n_")
    if fn not in ("count", "sum"):
        raise ValueError(f"pivot fn must be count|sum, got {fn!r}")

    out_names = [f"{prefix}{v}" for v in values]

    def partial(t: pa.Table) -> pa.Table:
        cat = t[pivot_col]
        base = {key: t[key]}
        for v, out in zip(values, out_names):
            ind = pc.cast(pc.equal(cat, v), pa.int64())
            ind = pc.if_else(pc.is_null(ind), pa.scalar(0, pa.int64()), ind)
            if fn == "sum":
                ind = pc.multiply(
                    pc.cast(ind, pa.float64()), pc.cast(t[field], pa.float64())
                )
            base[out] = ind.combine_chunks() if isinstance(ind, pa.ChunkedArray) else ind
        return pa.table(base).group_by([key]).aggregate(
            [(out, "sum") for out in out_names]
        ).rename_columns([key] + out_names)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    final = partials.groupby(key).aggregate(
        *[Sum(out, alias_name=out) for out in out_names]
    )
    if fn == "count":
        final = final.map_batches(
            lambda t: pa.table(
                {key: t[key], **{o: pc.cast(t[o], pa.int64()) for o in out_names}}
            ),
            batch_format="pyarrow",
        )
    return final


def quantile_bucket(ds, options: dict, ctx=None):
    """Global quantile bucketing: assign every row the corpus-level
    quantile bucket of a value column (the length-percentile-filter
    shape: "keep the middle 80% by doc length").

    {"type": "quantile_bucket", "field": "value", "buckets": 4,
     "target": "qbucket", "approx": false}

    Two passes: the k-1 thresholds come from the two-phase quantile
    aggregate (exact np.quantile == SQL quantile_cont, or the mergeable
    log-linear sketch with ``approx``), broadcast once; the second pass
    assigns buckets with one vectorized searchsorted per batch. Bucket
    i (1-based) = 1 + number of thresholds <= value; values equal to a
    threshold land in the upper bucket."""
    import ray as _ray

    field = options["field"]
    k = int(options.get("buckets", 4))
    target = options.get("target", "qbucket")
    approx = bool(options.get("approx", False))
    if k < 2:
        raise ValueError("buckets must be >= 2")

    fn = "approx_quantile" if approx else "quantile"
    qs = [i / k for i in range(1, k)]
    stats = aggregate(
        ds.map_batches(
            lambda t: t.select([field]).append_column(
                "__one", pa.array([1] * t.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        ),
        {
            "group_by": ["__one"],
            "aggregates": {
                f"q{i}": {"fn": fn, "field": field, "q": q}
                for i, q in enumerate(qs)
            },
        },
    ).take_all()
    row = stats[0]
    from vector_ray.schema import round_sql_np

    # round thresholds to 9 digits on BOTH sides (oracle: ROUND(t, 9))
    # so a value sitting exactly on a boundary buckets identically
    thresholds = round_sql_np(
        np.array([row[f"q{i}"] for i in range(len(qs))], np.float64), 9
    )
    thr_ref = _ray.put(thresholds)

    class Assign:
        def __init__(self, ref):
            self.thr = _ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            vals = np.asarray(pc.cast(
                t[field].combine_chunks()
                if isinstance(t[field], pa.ChunkedArray) else t[field],
                pa.float64(),
            ))
            b = np.searchsorted(self.thr, vals, side="right") + 1
            return t.append_column(target, pa.array(b, pa.int64()))

    return ds.map_batches(
        Assign, fn_constructor_args=(thr_ref,), batch_format="pyarrow",
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# grouping_sets — multi-level aggregation (SQL GROUPING SETS / ROLLUP /
# CUBE) in ONE pass over the data.
#   options = {"sets": [[col, ...], ...],   # one entry per grouping set
#              "aggregates": {...},          # same spec as `aggregate`
#              "round": int | None}
# Complement of `rollup` above: rollup re-aggregates the finest level
# (cheapest plan, but prefix levels only and re-aggregatable fns only);
# grouping_sets expands each batch instead, so it takes ARBITRARY sets
# (CUBE, disjoint sets) and holistic aggregates (quantiles, exact
# count_distinct) that cannot be recomputed from a coarser aggregate.
# Each batch is expanded to k masked copies (columns outside a set
# become typed nulls) tagged with a set id; the existing two-phase
# aggregate then collapses every copy per batch BEFORE the shuffle, so
# the exchange carries k small partials per batch — never k x rows.
# The output carries every union column (null where aggregated away)
# plus `grouping_id`, the SQL GROUPING(c1..ck) bitmask (leftmost listed
# column = most significant bit; 1 = column aggregated away), which
# disambiguates rollup nulls from null DATA values exactly like SQL.
# ---------------------------------------------------------------------------


def rollup_sets(cols: list[str]) -> list[list[str]]:
    """ROLLUP(c1..cn): n+1 prefixes, longest first — (c1..cn), ...,
    (c1), ()."""
    cols = list(cols)
    return [cols[:i] for i in range(len(cols), -1, -1)]


def cube_sets(cols: list[str]) -> list[list[str]]:
    """CUBE(c1..cn): all 2^n subsets, full set first."""
    import itertools

    cols = list(cols)
    out = []
    for r in range(len(cols), -1, -1):
        out.extend(list(c) for c in itertools.combinations(cols, r))
    return out


def grouping_sets(ds, options: dict, ctx=None):
    sets = [list(s) for s in options["sets"]]
    if not sets:
        raise ValueError("grouping_sets: need at least one set")
    aggregates = dict(options["aggregates"])
    all_cols: list[str] = []
    for s in sets:
        for c in s:
            if c not in all_cols:
                all_cols.append(c)
    if not all_cols:
        raise ValueError(
            "grouping_sets: at least one set must name a column (a "
            "grand total alone is a plain global aggregate)"
        )
    agg_fields: list[str] = []
    for spec in aggregates.values():
        f = spec.get("field")
        if f and f not in agg_fields and f not in all_cols:
            agg_fields.append(f)
    k = len(all_cols)
    masks = [[c in s for c in all_cols] for s in sets]
    gids = [
        sum((0 if in_set else 1) << (k - 1 - i) for i, in_set in enumerate(m))
        for m in masks
    ]

    def _null_sentinel(typ: pa.DataType) -> pa.Scalar:
        # the value is irrelevant (a companion __n_ indicator column is
        # part of the group key, so a sentinel can never merge with a
        # real value) — it only has to be a NON-NULL value of the type,
        # because Ray's sort-boundary partitioning compares key tuples
        # in Python and None < str raises TypeError
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            return pa.scalar("", typ)
        if pa.types.is_boolean(typ):
            return pa.scalar(False, typ)
        return pa.scalar(0, typ)  # ints / floats / timestamps

    def expand(t: pa.Table) -> pa.Table:
        parts = []
        for gi, m in enumerate(masks):
            cols = {}
            for keep, c in zip(m, all_cols):
                col = t[c].combine_chunks()
                base = col if keep else pa.nulls(t.num_rows, col.type)
                # null-free shuffle keys: (filled value, is-null flag)
                cols[c] = pc.fill_null(base, _null_sentinel(col.type))
                cols[f"__n_{c}"] = pc.is_null(base)
            for f in agg_fields:
                cols[f] = t[f]
            cols["__gset"] = pa.array(
                np.full(t.num_rows, gi, np.int64), pa.int64()
            )
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    null_cols = [f"__n_{c}" for c in all_cols]
    agg = aggregate(
        ds.map_batches(expand, batch_format="pyarrow"),
        {
            "group_by": all_cols + null_cols + ["__gset"],
            "aggregates": aggregates,
            "round": options.get("round"),
        },
        ctx,
    )
    gid_lookup = pa.array(gids, pa.int64())

    def finish(t: pa.Table) -> pa.Table:
        gid = pc.take(gid_lookup, t["__gset"].combine_chunks())
        for c in all_cols:
            # restore nulls (both masked-away columns and real null
            # data values) from the indicator
            restored = pc.if_else(
                t[f"__n_{c}"].combine_chunks(),
                pa.scalar(None, t.schema.field(c).type),
                t[c].combine_chunks(),
            )
            t = t.set_column(
                t.schema.get_field_index(c), c, restored
            )
        return t.drop_columns(null_cols + ["__gset"]).append_column(
            "grouping_id", gid
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def ols_trend(ds, options: dict, ctx=None):
    """Per-key ordinary-least-squares trend line: slope / intercept / r2
    of ``y_field`` regressed on ``x_field`` — drift detection over
    telemetry (is p95 latency creeping up per service?), the batch
    analog of Vector's aggregate windows feeding an alert threshold
    (reference alerts/mod.rs:56-79 consumes exactly this shape).

    {"type": "ols_trend", "group_by": "event_type",
     "x_field": "x", "y_field": "value", "round": 6}

    Two-phase and shuffle-light: each batch collapses to one
    (n, Σx, Σy, Σxy, Σx², Σy²) row per key present in the batch, the
    global groupby sums those tiny partials, and the closed-form
    finish runs on the |keys|-row result — the corpus itself never
    shuffles. Degenerate keys (n < 2 or zero x-variance) emit null
    slope/intercept/r2; zero y-variance emits r2 = null (SQL regr_r2
    divides by var(y)). Callers should pre-scale ``x_field`` to a
    modest range (e.g. days since an epoch, not raw nanoseconds) —
    raw Σx² on huge x loses the precision any sum-based formula
    (including the SQL oracle's) needs."""
    keys = options["group_by"]
    keys = [keys] if isinstance(keys, str) else list(keys)
    xf, yf = options["x_field"], options["y_field"]
    ndigits = options.get("round", 6)

    from vector_ray.schema import round_sql_np

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t[xf], pa.float64())
        y = pc.cast(t[yf], pa.float64())
        ok = pc.and_kleene(pc.is_valid(x), pc.is_valid(y))
        base = t.select(keys).append_column("__x", x).append_column("__y", y)
        base = base.filter(pc.fill_null(ok, False))
        xx = pc.multiply(base["__x"], base["__x"])
        xy = pc.multiply(base["__x"], base["__y"])
        yy = pc.multiply(base["__y"], base["__y"])
        base = (
            base.append_column("__xx", xx)
            .append_column("__xy", xy)
            .append_column("__yy", yy)
        )
        part = base.group_by(keys).aggregate(
            [
                ("__x", "count"),
                ("__x", "sum"),
                ("__y", "sum"),
                ("__xy", "sum"),
                ("__xx", "sum"),
                ("__yy", "sum"),
            ]
        )
        return part.rename_columns(
            keys + ["n", "sx", "sy", "sxy", "sxx", "syy"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    sums = aggregate(
        partials,
        {
            "group_by": keys,
            "aggregates": {
                "n": {"fn": "sum", "field": "n", "int": True},
                "sx": {"fn": "sum", "field": "sx"},
                "sy": {"fn": "sum", "field": "sy"},
                "sxy": {"fn": "sum", "field": "sxy"},
                "sxx": {"fn": "sum", "field": "sxx"},
                "syy": {"fn": "sum", "field": "syy"},
            },
        },
        ctx,
    )

    def finish(t: pa.Table) -> pa.Table:
        n = np.asarray(pc.cast(t["n"], pa.float64()))
        sx = np.asarray(t["sx"], dtype=np.float64)
        sy = np.asarray(t["sy"], dtype=np.float64)
        sxy = np.asarray(t["sxy"], dtype=np.float64)
        sxx = np.asarray(t["sxx"], dtype=np.float64)
        syy = np.asarray(t["syy"], dtype=np.float64)
        dx = n * sxx - sx * sx  # n² · var(x)
        dy = n * syy - sy * sy
        num = n * sxy - sx * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where((n >= 2) & (dx > 0), num / dx, np.nan)
            intercept = np.where(np.isnan(slope), np.nan, (sy - slope * sx) / n)
            r2 = np.where(
                np.isnan(slope) | (dy <= 0), np.nan, (num * num) / (dx * dy)
            )

        def col(v):
            a = pa.array(round_sql_np(v, ndigits), pa.float64())
            return pc.if_else(pc.is_nan(a), pa.scalar(None, pa.float64()), a)

        out = t.select(keys)
        out = out.append_column("n", pc.cast(t["n"], pa.int64()))
        out = out.append_column("slope", col(slope))
        out = out.append_column("intercept", col(intercept))
        out = out.append_column("r2", col(r2))
        return out

    return sums.map_batches(finish, batch_format="pyarrow")


def cooccurrence(ds, options: dict, ctx=None):
    """Market-basket co-occurrence: for every unordered pair of distinct
    ``state_field`` values sharing an entity, how many entities exhibit
    BOTH — "users who triggered A also triggered B", the support counts
    behind association mining and alert-correlation matrices.

    {"type": "cooccurrence", "entity": "user_id",
     "state_field": "event_type", "min_support": 2}

    One hash shuffle on the entity key. Each batch first collapses to
    distinct (entity, state) pairs (the combiner — repeated events of
    one type never cross the exchange), each entity group then emits
    its sorted-distinct pair list (bounded by the state-domain choose 2,
    NOT by event count), and a final two-phase count sums per-group
    partials. Pick a bounded-cardinality ``state_field``; an unbounded
    one makes the per-entity pair blowup quadratic by construction."""
    entity = options["entity"]
    state = options.get("state_field", "event_type")
    min_support = int(options.get("min_support", 1))

    def distinct_pairs(t: pa.Table) -> pa.Table:
        return (
            t.select([entity, state])
            .filter(pc.is_valid(t[state]))
            .group_by([entity, state])
            .aggregate([])
        )

    def pairs(g: pa.Table) -> pa.Table:
        col = g[state]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = np.unique(np.asarray(col.to_numpy(zero_copy_only=False), dtype=object))
        m = len(vals)
        empty = pa.table(
            {
                "state_a": pa.array([], pa.string()),
                "state_b": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if m < 2:
            return empty
        ia, ib = np.triu_indices(m, k=1)
        return pa.table(
            {
                "state_a": pa.array(vals[ia], pa.string()),
                "state_b": pa.array(vals[ib], pa.string()),
                "n": pa.array(np.ones(len(ia), np.int64)),
            }
        )

    per_entity = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby(entity)
        .map_groups(pairs, batch_format="pyarrow")
    )
    counts = aggregate(
        per_entity,
        {
            "group_by": ["state_a", "state_b"],
            "aggregates": {"n": {"fn": "sum", "field": "n", "int": True}},
        },
        ctx,
    )
    if min_support > 1:
        counts = counts.filter(
            expr=f"n >= {min_support}"
        )
    return counts


def holt(ds, options: dict, ctx=None):
    """Per-key Holt linear (double-exponential) smoothing — EWMA plus an
    explicit TREND state, the classic capacity-forecast / drift-baseline
    smoother ``ewma`` can't express (a steadily climbing series lags a
    plain EWMA forever; Holt's trend term closes the gap):

        l_1 = round(x_1, 9)                          b_1 = 0.0
        l_t = round(alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1}), 9)
        b_t = round(beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}, 9)

    {"type": "holt", "group_by": "user_id",
     "order_by": ["ts", "event_id"], "field": "value",
     "alpha": 0.3, "beta": 0.2, "round": 4}

    Same execution shape as ``ewma`` (the recurrence is sequential per
    key): keys are hash-bucketed (one shuffle on the bucket id), one
    lexsort by (key, order_by...) per bucket, then a step loop of
    length max-rows-per-key where step k updates the k-th row of EVERY
    key's sequence in two numpy expressions. Each assignment is pinned
    to 9 decimals so a recursive SQL oracle reproduces the recurrence
    bit-for-bit at any partitioning. A null input poisons the rest of
    that key's level AND trend tail (NULL propagates through SQL
    arithmetic identically). Output columns: ``holt_level_<field>``
    and ``holt_trend_<field>``; all input columns pass through.

    Partitioning assumption: one BUCKET of keys fits one worker
    (``num_buckets`` sizes this); ``order_by`` must be a deterministic
    total order within a key (end it with a unique id)."""
    from vector_ray.schema import round_sql_np
    from vector_ray.stages import shuffle as _shuffle

    key = options["group_by"]
    order_by = options["order_by"]
    field = options["field"]
    alpha = float(options.get("alpha", 0.3))
    beta = float(options.get("beta", 0.2))
    ndigits = options.get("round")
    num_buckets = int(options.get("num_buckets", 64))
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"holt: alpha must be in (0, 1], got {alpha}")
    if not (0.0 <= beta <= 1.0):
        raise ValueError(f"holt: beta must be in [0, 1], got {beta}")
    ac = 1.0 - alpha
    bc = 1.0 - beta

    def smooth(g: pa.Table) -> pa.Table:
        g = g.drop_columns([_shuffle.BUCKET_COLUMN])
        kcol = _sortable(g[key])
        keys = [_sortable(g[c]) for c in reversed(order_by)]
        keys.append(kcol)  # primary sort key: the entity
        order = np.lexsort(keys)
        col = g[field]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        x = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)[order]
        ks = kcol[order]
        m = len(x)
        starts = np.flatnonzero(
            np.concatenate([[True], ks[1:] != ks[:-1]])
        ) if m else np.empty(0, np.int64)
        lens = np.diff(np.concatenate([starts, [m]]))
        lv = np.empty(m, dtype=np.float64)
        tr = np.empty(m, dtype=np.float64)
        lv[starts] = round_sql_np(x[starts], 9)
        tr[starts] = 0.0
        for k in range(1, int(lens.max()) if m else 0):
            sel = starts[lens > k] + k
            prev_l, prev_b = lv[sel - 1], tr[sel - 1]
            new_l = round_sql_np(alpha * x[sel] + ac * (prev_l + prev_b), 9)
            lv[sel] = new_l
            tr[sel] = round_sql_np(beta * (new_l - prev_l) + bc * prev_b, 9)
        if ndigits is not None:
            lv = round_sql_np(round_sql_np(lv, 9), ndigits)
            tr = round_sql_np(round_sql_np(tr, 9), ndigits)
        out_l = np.empty(m, dtype=np.float64)
        out_b = np.empty(m, dtype=np.float64)
        out_l[order] = lv
        out_b[order] = tr
        return g.append_column(
            f"holt_level_{field}", pa.array(out_l, pa.float64(), from_pandas=True)
        ).append_column(
            f"holt_trend_{field}", pa.array(out_b, pa.float64(), from_pandas=True)
        )

    bucketed = _shuffle.hash_bucket(ds, key, num_buckets)
    return bucketed.groupby(_shuffle.BUCKET_COLUMN).map_groups(
        smooth, batch_format="pyarrow"
    )


def autocorr(ds, options: dict, ctx=None):
    """Per-key lag-k autocorrelation — Pearson r between each row's
    value and the value ``lag`` rows earlier in ``order_by`` order: the
    seasonality / self-similarity probe (a daily-periodic metric shows
    a spike at its period; white noise shows ~0). One number per key.

    {"type": "autocorr", "group_by": "user_id",
     "order_by": ["ts", "event_id"], "field": "value",
     "lag": 1, "round": 6}

    One hash shuffle on the key; per group one lexsort, the lagged
    pairing is two slices, and the five moment sums are single numpy
    reductions — the same sum-based normal-equation style as
    ``ols_trend`` so the SQL oracle (LAG window + SUM aggregates,
    identical closed form) reproduces it. Pairs where either side is
    NULL are excluded (SQL LAG + WHERE semantics). Keys with fewer
    than 2 pairs or zero variance on either side yield acf = NULL.
    Output: key, n_pairs:int64, acf:float64.

    Partitioning assumption (same as SQL PARTITION BY): one key's rows
    fit one worker."""
    from vector_ray.schema import round_sql_np

    key = options["group_by"]
    order_by = options["order_by"]
    field = options["field"]
    lag = int(options.get("lag", 1))
    ndigits = options.get("round", 6)
    if lag < 1:
        raise ValueError(f"autocorr: lag must be >= 1, got {lag}")

    def acf(g: pa.Table) -> pa.Table:
        keys = [_sortable(g[c]) for c in reversed(order_by)]
        order = np.lexsort(keys)
        col = g[field]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vals = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)[order]
        isnull = np.asarray(pc.is_null(col))[order]
        kval = g[key][0]
        m = len(vals)
        if m <= lag:
            return pa.table(
                {
                    key: pa.array([kval.as_py()], g.schema.field(key).type),
                    "n_pairs": pa.array([0], pa.int64()),
                    "acf": pa.array([None], pa.float64()),
                }
            )
        cur, prev = vals[lag:], vals[:-lag]
        ok = ~(isnull[lag:] | isnull[:-lag])
        x, y = cur[ok], prev[ok]
        n = float(len(x))
        sx, sy = np.sum(x), np.sum(y)
        sxy = np.sum(x * y)
        sxx, syy = np.sum(x * x), np.sum(y * y)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        if n >= 2 and vx > 0 and vy > 0:
            r = (n * sxy - sx * sy) / np.sqrt(vx * vy)
            r = float(round_sql_np(np.array([r]), ndigits)[0])
        else:
            r = None
        return pa.table(
            {
                key: pa.array([kval.as_py()], g.schema.field(key).type),
                "n_pairs": pa.array([int(n)], pa.int64()),
                "acf": pa.array([r], pa.float64()),
            }
        )

    return ds.groupby(key).map_groups(acf, batch_format="pyarrow")


def scd2(ds, options: dict, ctx=None):
    """Slowly-changing-dimension type-2 history build: collapse each
    key's event stream into VALIDITY INTERVALS of its tracked
    attributes — one row per run of consecutive rows whose attrs are
    all equal (null-safely), carrying ``valid_from`` (first order
    value of the run), ``valid_to`` (first order value of the NEXT
    run, NULL for the last) and ``is_current``. The warehouse
    dimension-history primitive (what plan was this account on during
    March?).

    {"type": "scd2", "group_by": "user_id",
     "order_by": ["ts", "event_id"], "attrs": ["event_type"],
     "ts_field": "ts"}

    One hash shuffle on the key; per group one lexsort, then run
    detection compares DICTIONARY CODES (pyarrow dictionary_encode per
    attr — null-safe, no Python per-row compare), run ids by cumsum,
    run starts by flatnonzero. Output: key, attrs..., valid_from,
    valid_to, is_current:int64.

    Partitioning assumption (same as SQL PARTITION BY): one key's rows
    fit one worker."""
    key = options["group_by"]
    order_by = options["order_by"]
    attrs = options["attrs"]
    ts_field = options["ts_field"]

    def runs(g: pa.Table) -> pa.Table:
        keys = [_sortable(g[c]) for c in reversed(order_by)]
        order = np.lexsort(keys)
        m = g.num_rows
        idx = pa.array(order)
        srt = g.take(idx)
        chg = np.zeros(m, dtype=bool)
        if m:
            chg[0] = True
        for a in attrs:
            col = srt[a]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            enc = col.dictionary_encode()
            codes = np.asarray(
                pc.fill_null(pc.cast(enc.indices, pa.int64()), -1)
            )
            if m > 1:
                chg[1:] |= codes[1:] != codes[:-1]
        starts = np.flatnonzero(chg)
        nruns = len(starts)
        ts_col = srt[ts_field]
        ts_col = (
            ts_col.combine_chunks()
            if isinstance(ts_col, pa.ChunkedArray)
            else ts_col
        )
        vfrom = ts_col.take(pa.array(starts))
        # valid_to = next run's valid_from (NULL for the last run)
        if nruns:
            vto = vfrom.slice(1).cast(ts_col.type)
            vto = pa.concat_arrays(
                [vto, pa.array([None], ts_col.type)]
            )
        else:
            vto = pa.array([], ts_col.type)
        cur = np.zeros(nruns, dtype=np.int64)
        if nruns:
            cur[-1] = 1
        cols = {key: srt[key].take(pa.array(starts))}
        for a in attrs:
            cols[a] = srt[a].take(pa.array(starts))
        cols["valid_from"] = vfrom
        cols["valid_to"] = vto
        cols["is_current"] = pa.array(cur, pa.int64())
        return pa.table(cols)

    return ds.groupby(key).map_groups(runs, batch_format="pyarrow")


def survivorship(ds, options: dict, ctx=None):
    """Golden-record survivorship: one row per key carrying, for each
    listed field, the value of the LAST row (in ``order_by`` order)
    where that field is non-null — the entity-resolution merge rule
    ("most recent non-null wins" per attribute, each attribute
    independently). The standard MDM finish after clustering duplicate
    records.

    {"type": "survivorship", "group_by": "user_id",
     "order_by": ["ts", "event_id"], "fields": ["value", "event_type"]}

    One hash shuffle on the key; per group one lexsort (descending via
    reversed take), then per field one vectorized argmax over the
    validity mask. A field that is null in every row of the key stays
    NULL. Output: key, n_rows:int64, last_<field> for each field.

    Partitioning assumption (same as SQL PARTITION BY): one key's rows
    fit one worker."""
    key = options["group_by"]
    order_by = options["order_by"]
    fields = options["fields"]

    def golden(g: pa.Table) -> pa.Table:
        keys = [_sortable(g[c]) for c in reversed(order_by)]
        order = np.lexsort(keys)[::-1]  # descending: latest first
        srt = g.take(pa.array(order))
        kval = g[key][0]
        cols = {
            key: pa.array([kval.as_py()], g.schema.field(key).type),
            "n_rows": pa.array([g.num_rows], pa.int64()),
        }
        for f in fields:
            col = srt[f]
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            valid = np.asarray(pc.is_valid(col))
            if valid.any():
                pos = int(np.argmax(valid))  # first non-null in desc order
                cols[f"last_{f}"] = col.slice(pos, 1)
            else:
                cols[f"last_{f}"] = pa.array([None], col.type)
        return pa.table(cols)

    return ds.groupby(key).map_groups(golden, batch_format="pyarrow")


def welch_ttest(ds, options: dict, ctx=None):
    """Per-group Welch two-sample t-test — compare a metric between two
    experiment arms within every group WITHOUT assuming equal
    variances: the A/B-test readout (did the treatment move latency
    per endpoint?). Emits the t statistic and Welch-Satterthwaite
    degrees of freedom per group.

    {"type": "welch_ttest", "group_by": "event_type",
     "arm_field": "arm", "field": "value", "round": 6}

    ``arm_field`` must hold exactly two values per group (extra arms
    raise). Execution is a pure two-phase aggregate: per-batch moment
    partials (n, Σx, Σx²) per (group, arm) — one tiny row per
    (group, arm) per batch crosses the shuffle, the corpus never moves
    — then a per-group finalize computing

        m_i  = sx_i/n_i             v_i = (sxx_i - sx_i*sx_i/n_i)/(n_i-1)
        se2  = v_a/n_a + v_b/n_b    t   = (m_a - m_b)/sqrt(se2)
        df   = se2² / ((v_a/n_a)²/(n_a-1) + (v_b/n_b)²/(n_b-1))

    in exactly that expression shape so a SQL oracle built from SUM
    aggregates reproduces it. Arms are ordered by value (the lesser
    arm value is 'a') so the sign of t is deterministic. Groups where
    either arm has n < 2 or zero variance on both sides yield NULL
    t/df. Output: group, arm_a, arm_b, n_a:int64, n_b:int64,
    t_stat:float64, df:float64."""
    from vector_ray.schema import round_sql_np

    key = options["group_by"]
    arm_field = options["arm_field"]
    field = options["field"]
    ndigits = options.get("round", 6)

    def partials(t: pa.Table) -> pa.Table:
        both = pc.and_(pc.is_valid(t[field]), pc.is_valid(t[arm_field]))
        t = t.filter(both)
        x = pc.cast(t[field], pa.float64()).to_numpy(zero_copy_only=False)
        # dense (key, arm) pair codes -> one bincount pass per moment
        kcol = t[key]
        kcol = kcol.combine_chunks() if isinstance(kcol, pa.ChunkedArray) else kcol
        acol = t[arm_field]
        acol = acol.combine_chunks() if isinstance(acol, pa.ChunkedArray) else acol
        kc = np.asarray(pc.cast(kcol.dictionary_encode().indices, pa.int64()))
        ac = np.asarray(pc.cast(acol.dictionary_encode().indices, pa.int64()))
        width = int(ac.max()) + 1 if len(ac) else 1
        combined = kc * width + ac
        uniq, first, inv = np.unique(
            combined, return_index=True, return_inverse=True
        )
        n = np.bincount(inv).astype(np.float64)
        sx = np.bincount(inv, weights=x)
        sxx = np.bincount(inv, weights=x * x)
        sel = pa.array(first)
        return pa.table(
            {
                key: kcol.take(sel),
                arm_field: acol.take(sel),
                "n": pa.array(n, pa.float64()),
                "sx": pa.array(sx, pa.float64()),
                "sxx": pa.array(sxx, pa.float64()),
            }
        )

    merged = (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby([key, arm_field])
        .sum(["n", "sx", "sxx"])
        .map_batches(
            lambda t: t.rename_columns([key, arm_field, "n", "sx", "sxx"]),
            batch_format="pyarrow",
        )
    )

    def finalize(g: pa.Table) -> pa.Table:
        if g.num_rows > 2:
            arms = sorted(set(g[arm_field].to_pylist()))
            raise ValueError(
                f"welch_ttest: group {g[key][0].as_py()!r} has "
                f"{g.num_rows} arms {arms}; exactly two expected"
            )
        kval = g[key][0]
        out_empty = {
            key: pa.array([kval.as_py()], g.schema.field(key).type),
        }
        srt = g.sort_by(arm_field)
        a_n = srt["n"].to_pylist()
        a_sx = srt["sx"].to_pylist()
        a_sxx = srt["sxx"].to_pylist()
        arms = srt[arm_field].to_pylist()
        if g.num_rows < 2:
            return pa.table(
                {
                    **out_empty,
                    "arm_a": pa.array([arms[0]], g.schema.field(arm_field).type),
                    "arm_b": pa.array([None], g.schema.field(arm_field).type),
                    "n_a": pa.array([int(a_n[0])], pa.int64()),
                    "n_b": pa.array([0], pa.int64()),
                    "t_stat": pa.array([None], pa.float64()),
                    "df": pa.array([None], pa.float64()),
                }
            )
        na, nb = a_n
        t_stat = df_v = None
        if na >= 2 and nb >= 2:
            ma, mb = a_sx[0] / na, a_sx[1] / nb
            va = (a_sxx[0] - a_sx[0] * a_sx[0] / na) / (na - 1)
            vb = (a_sxx[1] - a_sx[1] * a_sx[1] / nb) / (nb - 1)
            se2 = va / na + vb / nb
            if se2 > 0:
                t_stat = (ma - mb) / np.sqrt(se2)
                df_v = (se2 * se2) / (
                    (va / na) * (va / na) / (na - 1)
                    + (vb / nb) * (vb / nb) / (nb - 1)
                )
                t_stat = float(round_sql_np(np.array([t_stat]), ndigits)[0])
                df_v = float(round_sql_np(np.array([df_v]), ndigits)[0])
        return pa.table(
            {
                **out_empty,
                "arm_a": pa.array([arms[0]], g.schema.field(arm_field).type),
                "arm_b": pa.array([arms[1]], g.schema.field(arm_field).type),
                "n_a": pa.array([int(na)], pa.int64()),
                "n_b": pa.array([int(nb)], pa.int64()),
                "t_stat": pa.array([t_stat], pa.float64()),
                "df": pa.array([df_v], pa.float64()),
            }
        )

    return merged.groupby(key).map_groups(finalize, batch_format="pyarrow")
