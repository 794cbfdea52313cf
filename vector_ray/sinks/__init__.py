"""Sink registry — data-plane subset of the reference's 38-sink catalog
(ui palette.rs:153-214; SURVEY.md §2.2).

``sink(ds, options, ctx) -> SinkResult``. Consuming a sink is what
triggers execution of the lazy upstream Dataset.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

import pyarrow as pa


@dataclass
class SinkResult:
    kind: str
    count: int | None = None
    path: str | None = None
    table: pa.Table | None = None
    extra: dict[str, Any] | None = None


def parquet_sink(ds, options: dict, ctx=None) -> SinkResult:
    """`file` sink analog (config_panel.rs:1909-1921): partitioned Parquet
    directory — never one giant file. `partition_cols` enables the
    single-pass fan-out write for routed streams (SURVEY.md §7.4)."""
    path = options["path"]
    os.makedirs(path, exist_ok=True)
    kwargs = {}
    if options.get("partition_cols"):
        kwargs["partition_cols"] = list(options["partition_cols"])
    if options.get("min_rows_per_file"):
        kwargs["min_rows_per_file"] = int(options["min_rows_per_file"])
    if options.get("row_group_size"):
        # row-group granularity = pruning granularity (footer min/max
        # stats are per group) — set it smaller than the default when
        # the output is zorder-clustered for selective scans
        kwargs["row_group_size"] = int(options["row_group_size"])
    if options.get("compression"):
        # passed through to pyarrow ParquetWriter (snappy default;
        # zstd/gzip/lz4/none) — the sink-side `compression` option of
        # the reference's file sink (config_panel.rs:1909-1921)
        kwargs["compression"] = str(options["compression"])
    if options.get("zorder"):
        # cluster the output on the Z-curve of these columns so later
        # range scans on ANY of them prune row groups (functions/
        # layout.py). One distributed sort at write time; mutually
        # exclusive with partition_cols (hive dirs already cluster).
        if options.get("partition_cols"):
            raise ValueError(
                "parquet sink: zorder and partition_cols are mutually "
                "exclusive — pick one clustering scheme"
            )
        from vector_ray.functions.layout import add_zorder_key

        cols = list(options["zorder"])
        keyed = add_zorder_key(ds, cols, normalize="rank")
        ds = keyed.sort("zkey").drop_columns(["zkey"])
    ds.write_parquet(path, **kwargs)
    return SinkResult(kind="parquet", path=path)


def console_sink(ds, options: dict, ctx=None) -> SinkResult:
    """`console` sink (config_panel.rs:1877-1889): print the first
    `limit` rows (tap-style sampling, tap/mod.rs:31 default limit 10)."""
    limit = int(options.get("limit", 10))
    rows = ds.take(limit)
    for r in rows:
        print(r)
    return SinkResult(kind="console", count=len(rows))


def blackhole_sink(ds, options: dict, ctx=None) -> SinkResult:
    """`blackhole` (palette.rs:157): consume and discard; returns count."""
    return SinkResult(kind="blackhole", count=ds.count())


def collect_sink(ds, options: dict, ctx=None) -> SinkResult:
    """Test sink — the `__test_output` console/json rewrite analog
    (functional_test.rs:258-287): materialize to one in-memory Arrow
    table. Only for small test outputs."""
    import ray

    # materialize() executes the plan exactly once; a bare to_arrow_refs()
    # adds a schema-probe execution that would double-count stage metrics
    tables = [t for t in ray.get(ds.materialize().to_arrow_refs())]
    nonempty = [t for t in tables if t.num_rows > 0] or tables[:1]
    if nonempty:
        tbl = pa.concat_tables(nonempty, promote_options="default")
    else:
        tbl = pa.table({})
    return SinkResult(kind="collect", count=tbl.num_rows, table=tbl)


def _maybe_select(ds, options: dict):
    # encoding.only_fields analog (config_panel.rs:1909-1921): CSV in
    # particular cannot hold list columns (e.g. tokens), so sinks accept
    # a column selection
    if options.get("columns"):
        return ds.select_columns(list(options["columns"]))
    return ds


def csv_sink(ds, options: dict, ctx=None) -> SinkResult:
    """file sink with encoding.codec=csv (config_panel.rs:1909-1921):
    partitioned CSV directory. Pass ``columns`` to drop non-scalar
    columns (CSV cannot represent lists)."""
    path = options["path"]
    os.makedirs(path, exist_ok=True)
    _maybe_select(ds, options).write_csv(path)
    return SinkResult(kind="csv", path=path)


def json_sink(ds, options: dict, ctx=None) -> SinkResult:
    """file sink with encoding.codec=json: newline-delimited JSON files."""
    path = options["path"]
    os.makedirs(path, exist_ok=True)
    _maybe_select(ds, options).write_json(path)
    return SinkResult(kind="json", path=path)


SINKS = {
    "parquet": parquet_sink,
    "file": parquet_sink,
    "csv": csv_sink,
    "json": json_sink,
    "console": console_sink,
    "blackhole": blackhole_sink,
    "collect": collect_sink,
    "memory": collect_sink,
}

__all__ = ["SINKS", "SinkResult"]
