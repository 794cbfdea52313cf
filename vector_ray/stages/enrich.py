"""Stateful enrichment — the `enrichment_tables` analog.

Vector reserves a top-level ``enrichment_tables`` config key for keyed
lookup-table enrichment (reference validation/mod.rs:184). The north rule
makes this a first-class stage: "source-keyed lookup tables held in
actor-pool workers".

Ray-Data mapping (SURVEY.md §2.4): the small side is broadcast — the
lookup table is put in the object store ONCE (``ray.put`` on the driver),
and each actor in the ``map_batches`` pool fetches it ONCE in
``__init__`` (zero-copy from the local object store on every node). Per
batch the join is a vectorized ``pc.index_in`` + ``pc.take`` — no
shuffle, no per-row Python.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray


def _load_table(table_ref) -> pa.Table:
    if isinstance(table_ref, pa.Table):
        return table_ref
    if isinstance(table_ref, str):
        # Vector's enrichment_tables are CSV files (validation/mod.rs:184);
        # parquet is the columnar-native path
        if table_ref.endswith(".csv"):
            from pyarrow import csv as pa_csv

            return pa_csv.read_csv(table_ref)
        return pq.read_table(table_ref)
    return ray.get(table_ref)  # ObjectRef


class Enricher:
    """Actor-pool callable: lookup-join a broadcast table into each batch.

    Setup (table fetch, key sort, column slicing) runs once per actor in
    ``__init__``; ``__call__`` is the per-batch vectorized path.
    """

    def __init__(
        self,
        table_ref,
        key: str,
        columns: list[str] | None = None,
        prefix: str = "",
        on_miss: str = "null",  # "null" | "drop" | "default"
        defaults: dict | None = None,
    ):
        lookup = _load_table(table_ref).combine_chunks()
        self.key = key
        self.on_miss = on_miss
        self.defaults = defaults or {}
        self.key_values = lookup[key].combine_chunks()
        cols = columns or [c for c in lookup.column_names if c != key]
        self.value_cols = [
            (f"{prefix}{c}", lookup[c].combine_chunks()) for c in cols
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if keys.type != self.key_values.type:
            # CSV-inferred lookup keys may be wider than the batch key
            # (e.g. int64 vs int32); widen the batch side, never the table
            keys = pc.cast(keys, self.key_values.type)
        indices = pc.index_in(keys, value_set=self.key_values)
        if self.on_miss == "drop":
            hit = pc.is_valid(indices)
            batch = batch.filter(hit)
            indices = indices.filter(hit)
        for name, values in self.value_cols:
            joined = pc.take(values, indices)  # null index → null value
            if self.on_miss == "default" and name in self.defaults:
                joined = pc.fill_null(joined, self.defaults[name])
            if isinstance(joined, pa.ChunkedArray):
                joined = joined.combine_chunks()
            if name in batch.column_names:
                batch = batch.set_column(batch.column_names.index(name), name, joined)
            else:
                batch = batch.append_column(name, joined)
        return batch


def enrich(ds, options: dict, ctx=None):
    table = options["table"]
    if isinstance(table, pa.Table):
        # broadcast once; workers read zero-copy from the object store
        table = ray.put(table)
    fn_kwargs = dict(
        table_ref=table,
        key=options.get("key", "source"),
        columns=options.get("columns"),
        prefix=options.get("prefix", ""),
        on_miss=options.get("on_miss", "null"),
        defaults=options.get("defaults"),
    )
    return ds.map_batches(
        Enricher,
        fn_constructor_kwargs=fn_kwargs,
        batch_format="pyarrow",
        batch_size=options.get("batch_size"),
        concurrency=(1, options.get("concurrency", 4)),
        num_cpus=options.get("num_cpus", 1),
    )
