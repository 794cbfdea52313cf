"""Metric-flavored transforms: log_to_metric, metric_to_log,
tag_cardinality_limit.

MetricEvent model (name/namespace/kind/value + tags) follows the
reference's shared/src/messages.rs:145-183; log_to_metric options follow
ui config_panel.rs:1799-1827 (palette.rs:142-146).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.vrl import compile_expr


# ---------------------------------------------------------------------------
# log_to_metric — derive metric rows from log rows:
#   options["metrics"] = [{"type": "counter"|"gauge", "name": str,
#                          "namespace": str, "field": col | None,
#                          "increment_by_value": bool,
#                          "tags": {tag: ".field" | literal}}]
# Emits the flat metric table (name, namespace, kind, value, tag columns).
# Aggregation of counters is a separate `aggregate` stage (two-phase).
# ---------------------------------------------------------------------------


def log_to_metric(ds, options: dict, ctx=None):
    metrics = options["metrics"]
    compiled = []
    for m in metrics:
        tags = {
            k: compile_expr(v) if isinstance(v, str) and v.startswith(".") else v
            for k, v in (m.get("tags") or {}).items()
        }
        compiled.append((m, tags))

    def derive(t: pa.Table) -> pa.Table:
        parts = []
        for m, tags in compiled:
            n = t.num_rows
            kind = m.get("type", "counter")
            # metric value kinds beyond counter/gauge
            # (shared/src/messages.rs:176-183): `set` emits the value as
            # a string member (cardinality computed downstream with the
            # `count_distinct` aggregate); distribution / histogram /
            # summary emit raw float samples (quantiles via the
            # p50/p90/p99 aggregates, buckets via `count_le`)
            set_member = None
            if kind == "set":
                sm = pc.cast(t[m["field"]], pa.string())
                set_member = sm.combine_chunks() if isinstance(sm, pa.ChunkedArray) else sm
                value = pa.nulls(n, pa.float64())
            elif kind == "counter" and not m.get("increment_by_value"):
                value = pa.array([1.0] * n)
            else:
                value = pc.cast(t[m["field"]], pa.float64())
                if isinstance(value, pa.ChunkedArray):
                    value = value.combine_chunks()
            metric_kind = {
                "gauge": "absolute",
                "counter": "incremental",
            }.get(kind, kind)  # set/distribution/histogram/summary keep their name
            cols = {
                "name": pa.array([m["name"]] * n, pa.string()),
                "namespace": pa.array([m.get("namespace", "")] * n, pa.string()),
                "kind": pa.array([metric_kind] * n, pa.string()),
                "value": value,
            }
            if set_member is not None:
                cols["set_member"] = set_member
            for tag, src in tags.items():
                if callable(src):
                    v = src(t)
                    v = pc.cast(v, pa.string())
                    cols[tag] = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
                else:
                    cols[tag] = pa.array([str(src)] * n, pa.string())
            parts.append(pa.table(cols))
        if not parts:
            return pa.table({"name": pa.array([], pa.string())})
        # all metric specs must produce the same tag schema to concat;
        # unify by promoting missing tag columns to null
        all_cols: list[str] = []
        for p in parts:
            for c in p.column_names:
                if c not in all_cols:
                    all_cols.append(c)
        norm = []
        for p in parts:
            for c in all_cols:
                if c not in p.column_names:
                    p = p.append_column(c, pa.nulls(p.num_rows, pa.string()))
            norm.append(p.select(all_cols))
        return pa.concat_tables(norm)

    return ds.map_batches(derive, batch_format="pyarrow")


def metric_to_log(ds, options: dict, ctx=None):
    """Inverse conversion (palette.rs:143): metric rows become log rows —
    a rename/projection; tag columns stay as fields."""
    prefix = options.get("prefix", "metric_")

    def convert(t: pa.Table) -> pa.Table:
        names = [
            f"{prefix}{c}" if c in ("name", "namespace", "kind", "value") else c
            for c in t.column_names
        ]
        return t.rename_columns(names)

    return ds.map_batches(convert, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# tag_cardinality_limit (palette.rs:146) — cap the number of distinct
# values per tag column. Batch mode needs a deterministic "allowed set"
# (Vector's is first-seen, which has no meaning without arrival order):
# we keep the `value_limit` most frequent values (ties broken by value
# order), then either drop rows ("drop_event") or null the tag
# ("drop_tag").
#
# Scale design: this is inherently two-pass (pass 1 computes the allowed
# set, pass 2 applies it), but the allowed set is computed ENTIRELY in
# Ray — per-batch partial counts → groupby sum → distributed sort →
# limit(value_limit). The driver only ever holds ≤ value_limit rows per
# field (the operator's own bound), never the unbounded distinct-value
# set that this operator exists to guard against. The sets are broadcast
# once (ray.put) and fetched once per apply-actor in __init__.
# ---------------------------------------------------------------------------

_TCL_COUNT = "__tcl_cnt"


def _top_values(ds, field: str, limit: int) -> list:
    """The `limit` most frequent non-null values of `field`, ties broken
    by ascending value — computed distributed, never materializing more
    than `limit` rows on the driver."""

    def partial(t: pa.Table, f=field) -> pa.Table:
        g = t.select([f]).group_by([f]).aggregate([([], "count_all")])
        g = g.rename_columns([f, _TCL_COUNT])
        return g.filter(pc.is_valid(g[f]))

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(field)
        .sum(_TCL_COUNT)
    )
    top = counts.sort(
        [f"sum({_TCL_COUNT})", field], descending=[True, False]
    ).limit(limit)
    return [row[field] for row in top.take_all()]  # ≤ limit rows by construction


class _TagLimiter:
    """Apply-stage actor: fetches the broadcast allowed sets once."""

    def __init__(self, allowed_ref, action: str):
        import ray

        self.allowed = ray.get(allowed_ref)  # {field: pa.Array of allowed values}
        self.action = action

    def __call__(self, t: pa.Table) -> pa.Table:
        for f, value_set in self.allowed.items():
            ok = pc.fill_null(pc.is_in(t[f], value_set=value_set), False)
            if self.action == "drop_event":
                t = t.filter(ok)
            else:
                col = pc.if_else(ok, t[f], pa.scalar(None, t.schema.field(f).type))
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                t = t.set_column(t.column_names.index(f), f, col)
        return t


def tag_cardinality_limit(ds, options: dict, ctx=None):
    import ray

    fields = list(options.get("fields") or [options["field"]])
    limit = int(options.get("value_limit", 500))
    action = options.get("limit_exceeded_action", "drop_tag")

    allowed = {
        f: pa.array(sorted(_top_values(ds, f, limit))) for f in fields
    }
    allowed_ref = ray.put(allowed)
    return ds.map_batches(
        _TagLimiter,
        fn_constructor_kwargs={"allowed_ref": allowed_ref, "action": action},
        batch_format="pyarrow",
        concurrency=(1, options.get("concurrency", 4)),
        num_cpus=1,
    )
