"""Reshape / per-row window transforms: explode, unpivot, rank, lag_delta.

``explode`` and ``unpivot`` are NARROW (pure map_batches, no shuffle —
they reshape inside each block, so they stream at any scale). ``rank``
and ``lag_delta`` are per-key window functions: one hash shuffle on the
group key, then vectorized numpy work per group (same shape as
grouped.sessionize / grouped.cumulative).

Reference mapping: the reference has no reshape transforms (its events
are schemaless JSON rows, ui/src/components/pipeline/data_view.rs:354);
these are the Arrow-columnar equivalents a training-data pipeline needs
for token-level work (explode a list<int32> tokens column) and for
metric wide/long conversion (unpivot is the metric_to_log wide-row
inverse of stages/grouped.pivot).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _combine(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def explode(ds, options: dict, ctx=None):
    """Flatten a list column to one row per element (SQL UNNEST).

    {"type": "explode", "field": "tokens", "keep": ["doc_id"],
     "index_field": "pos", "target": "token"}

    Vectorized: parent rows are repeated via take() on the list offsets
    (zero Python loops); ``index_field`` (optional) adds the 0-based
    position within the list. Null/empty lists produce no rows."""
    field = options["field"]
    keep = options.get("keep")
    index_field = options.get("index_field")
    target = options.get("target", field)

    def _explode(t: pa.Table) -> pa.Table:
        lst = _combine(t[field])
        # null lists behave like empty (no output rows) — both
        # list_value_length (null -> 0 below) and list_flatten skip them
        lens = np.asarray(
            pc.fill_null(pc.list_value_length(lst), 0), dtype=np.int64
        )
        parent = np.repeat(np.arange(len(lst), dtype=np.int64), lens)
        cols: dict = {}
        for c in keep if keep is not None else [c for c in t.column_names if c != field]:
            cols[c] = _combine(t[c]).take(pa.array(parent, pa.int64()))
        if index_field is not None:
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
                starts, lens
            )
            cols[index_field] = pa.array(pos, pa.int64())
        flat = pc.list_flatten(lst)
        cols[target] = _combine(flat)
        return pa.table(cols)

    return ds.map_batches(_explode, batch_format="pyarrow")


def unpivot(ds, options: dict, ctx=None):
    """Wide -> long (SQL UNPIVOT): one output row per (input row, field).

    {"type": "unpivot", "id_fields": ["user_id"],
     "fields": ["n_view", "n_click"], "key_field": "metric",
     "value_field": "n"}

    Shuffle-free: each block emits len(fields) stacked slices; values
    are cast to a common type (float64 for numerics, else string)."""
    id_fields = list(options["id_fields"])
    fields = list(options["fields"])
    key_field = options.get("key_field", "name")
    value_field = options.get("value_field", "value")

    def _unpivot(t: pa.Table) -> pa.Table:
        all_num = all(
            pa.types.is_integer(t.schema.field(f).type)
            or pa.types.is_floating(t.schema.field(f).type)
            for f in fields
        )
        vtype = pa.float64() if all_num else pa.string()
        parts = []
        for f in fields:
            cols = {c: t[c] for c in id_fields}
            cols[key_field] = pa.array([f] * t.num_rows, pa.string())
            cols[value_field] = pc.cast(t[f], vtype)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(_unpivot, batch_format="pyarrow")


def _order_values(g: pa.Table, order_by: list[str]) -> list[np.ndarray]:
    out = []
    for c in order_by:
        col = _combine(g[c])
        if pa.types.is_timestamp(col.type):
            # nulls -> NaN, which numpy sorts last (SQL NULLS LAST)
            out.append(np.asarray(pc.cast(col, pa.int64())))
        elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            # dense rank preserves order AND equality while mapping to
            # ints — null-safe (numpy cannot sort object arrays with
            # None); nulls rank last and equal, like SQL peers
            out.append(
                np.asarray(
                    pc.rank(
                        col,
                        sort_keys="ascending",
                        null_placement="at_end",
                        tiebreaker="dense",
                    )
                )
            )
        else:
            out.append(np.asarray(col))
    return out


def rank(ds, options: dict, ctx=None):
    """Per-key SQL ranking: rank / dense_rank / percent_rank over an
    order column, ties sharing a rank exactly like the SQL window
    functions.

    {"type": "rank", "group_by": "event_type", "order_by": "value",
     "descending": true, "mode": "dense_rank", "target": "r"}

    One hash shuffle on the key; each group argsorts once and computes
    tie-aware ranks vectorized (first-of-run detection on the sorted
    order, cumsum for dense, propagation for competition rank).
    ``descending`` may be a single bool (whole ordering) or a list of
    bools, one per order column (SQL per-column ASC/DESC).

    Partitioning assumption (same as SQL PARTITION BY): one key's
    rows fit one worker; a pathologically hot key becomes a straggler
    (pre-split upstream or salt if a key can exceed worker memory)."""
    key = options["group_by"]
    order_cols = options["order_by"]
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    order_cols = list(order_cols)
    descending = options.get("descending", False)
    if not isinstance(descending, (list, tuple)):
        descending = bool(descending)
    mode = options.get("mode", "rank")
    target = options.get("target", mode)
    if mode not in ("rank", "dense_rank", "percent_rank", "ntile"):
        raise ValueError(f"unknown rank mode {mode!r}")
    n_buckets = int(options.get("n_buckets", 4))

    def _rank(g: pa.Table) -> pa.Table:
        return rank_table(
            g, order_cols=order_cols, descending=descending, mode=mode,
            n_buckets=n_buckets, target=target,
        )

    return ds.groupby(key).map_groups(_rank, batch_format="pyarrow")


def rank_table(
    g: pa.Table,
    *,
    order_cols: list[str],
    descending: bool = False,
    mode: str = "rank",
    n_buckets: int = 4,
    target: str = "rank",
) -> pa.Table:
    """Pure per-group ranking kernel (one key's rows) — see ``rank``."""
    vals_list = _order_values(g, order_cols)
    n = len(vals_list[0])
    if isinstance(descending, (list, tuple)):
        # per-column direction: _order_values maps every dtype to a
        # numeric key (dense rank for strings), so negation flips order
        if len(descending) != len(order_cols):
            raise ValueError("descending list must match order_by length")
        def flip(v: np.ndarray) -> np.ndarray:
            if v.dtype.kind == "u":
                # exact unsigned inversion (negation would wrap)
                return v.max() - v if len(v) else v
            return -v  # signed/float negation (INT64_MIN alone would wrap)

        keyed = [
            (flip(v) if d else v) for v, d in zip(vals_list, descending)
        ]
        order = np.lexsort(list(reversed(keyed)))
    else:
        # dtype-agnostic uniform descending: reverse the ascending order
        # (ties stay contiguous, and rank depends only on the value runs)
        order = np.lexsort(list(reversed(vals_list)))
        if descending:
            order = order[::-1]
    # new_run[i] = 1 when sorted row i starts a new distinct TUPLE
    # of order values (a tie must match on every order column)
    new_run = np.ones(n, dtype=np.int64)
    if n > 1:
        diff = np.zeros(n - 1, dtype=bool)
        for vals in vals_list:
            sv = vals[order]
            diff |= sv[1:] != sv[:-1]
        new_run[1:] = diff.astype(np.int64)
    pos = np.arange(1, n + 1, dtype=np.int64)
    # competition rank: position of the first row of the run
    first_pos = np.maximum.accumulate(np.where(new_run == 1, pos, 0))
    if mode == "dense_rank":
        ranked = np.cumsum(new_run)
    elif mode == "rank":
        ranked = first_pos
    elif mode == "ntile":
        # SQL NTILE(k): first (n % k) buckets get ceil(n/k) rows —
        # row-position based, NOT tie-aware (matches the window fn)
        big = n % n_buckets
        size_big = -(-n // n_buckets)  # ceil
        size_small = n // n_buckets
        cut = big * size_big
        ranked = np.where(
            pos <= cut,
            (pos - 1) // max(size_big, 1) + 1,
            big + (pos - cut - 1) // max(size_small, 1) + 1,
        ).astype(np.int64)
    else:  # percent_rank = (rank - 1) / (n - 1), 0 for n == 1
        ranked = (first_pos - 1) / (n - 1) if n > 1 else np.zeros(n)
    out = np.empty(n, dtype=ranked.dtype)
    out[order] = ranked
    typ = pa.float64() if mode == "percent_rank" else pa.int64()
    return g.append_column(target, pa.array(out, typ))


def lag_delta(ds, options: dict, ctx=None):
    """Per-key difference from the previous event (value - lag(value)
    ordered by a deterministic sort-key list; first event per key is
    null) — the per-event counterpart of grouped.interarrival.

    {"type": "lag_delta", "group_by": "user_id",
     "order_by": ["ts", "event_id"], "field": "value",
     "target": "delta", "round": 4}

    ``order_by`` must make rows unique within a key or lag() is not
    well-defined.

    Partitioning assumption (same as SQL PARTITION BY): one key's
    rows fit one worker; a pathologically hot key becomes a straggler
    (pre-split upstream or salt if a key can exceed worker memory)."""
    key = options["group_by"]
    order_by = list(options["order_by"])
    field = options["field"]
    target = options.get("target", f"delta_{field}")
    ndigits = options.get("round")

    def _delta(g: pa.Table) -> pa.Table:
        return lag_delta_table(
            g, order_by=order_by, field=field, target=target, ndigits=ndigits
        )

    return ds.groupby(key).map_groups(_delta, batch_format="pyarrow")


def lag_delta_table(
    g: pa.Table,
    *,
    order_by: list[str],
    field: str,
    target: str,
    ndigits: int | None = None,
) -> pa.Table:
    """Pure per-group lag-difference kernel — see ``lag_delta``."""
    from vector_ray.schema import round_sql_np

    keys = _order_values(g, order_by)
    order = np.lexsort(list(reversed(keys)))
    vals = np.asarray(pc.cast(_combine(g[field]), pa.float64()))
    sv = vals[order]
    d = np.empty(len(sv), dtype=np.float64)
    d[0] = np.nan
    if len(sv) > 1:
        d[1:] = sv[1:] - sv[:-1]
    if ndigits is not None:
        d = round_sql_np(round_sql_np(d, 9), ndigits)
    out = np.empty(len(sv), dtype=np.float64)
    out[order] = d
    arr = pa.array(out, pa.float64())
    arr = pc.if_else(pc.is_nan(arr), pa.scalar(None, pa.float64()), arr)
    return g.append_column(target, arr)


def log_templates(ds, options: dict, ctx=None):
    """Drain-style log template mining, batch form: mask the variable
    parts of each message (numbers by default, plus optional custom
    masks), then count occurrences per template — the "what is this
    log line, structurally" rollup every telemetry pipeline runs.

    {"type": "log_templates", "field": "message",
     "masks": [["[0-9]+", "<N>"]],      # [pattern, replacement] pairs
     "example": true}                    # keep MIN(message) per template

    Two-phase: one vectorized regex replace + per-batch partial counts
    (one row per template per batch crosses the shuffle, never raw
    messages), then a tiny groupby merge. Template cardinality is the
    number of distinct log SHAPES — bounded in practice, which is the
    point of the operator."""
    from ray.data.aggregate import Min, Sum

    field = options["field"]
    masks = [tuple(m) for m in options.get("masks", [["[0-9]+", "<N>"]])]
    keep_example = bool(options.get("example", True))

    def partial(t: pa.Table) -> pa.Table:
        col = _combine(pc.cast(t[field], pa.string()))
        tpl = col
        for pat, repl in masks:
            tpl = pc.replace_substring_regex(tpl, pattern=pat, replacement=repl)
        base = pa.table({"template": tpl, "__msg": col})
        agg = base.group_by(["template"]).aggregate(
            [("__msg", "count"), ("__msg", "min")]
        )
        return agg.rename_columns(["template", "__n", "__ex"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum("__n", alias_name="n")]
    if keep_example:
        aggs.append(Min("__ex", alias_name="example"))
    final = partials.groupby("template").aggregate(*aggs)
    return final.map_batches(
        lambda t: t.set_column(
            t.column_names.index("n"), "n", pc.cast(t["n"], pa.int64())
        ),
        batch_format="pyarrow",
    )
