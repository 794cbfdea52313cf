"""Source registry — the data-plane-relevant subset of the reference's
33-source catalog (ui palette.rs:70-122; SURVEY.md §2.2).

Each entry maps a ``type`` string to ``source(options, ctx) ->
ray.data.Dataset``. Connector-only sources (kafka, s3, ...) are modeled
as partitioned-table reads; anything without data-plane semantics is
intentionally not built (SURVEY.md §2.2).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from vector_ray import datagen


def _paths(options: dict):
    return options.get("paths") or options["path"]


def parquet_source(options: dict, ctx=None):
    """`file` source analog for the real corpus: column-pruned parallel
    Parquet read (prune at the read — SURVEY.md 'Optimize for scale')."""
    kwargs = {}
    if options.get("columns"):
        kwargs["columns"] = list(options["columns"])
    if options.get("override_num_blocks"):
        kwargs["override_num_blocks"] = int(options["override_num_blocks"])
    return rd.read_parquet(_paths(options), **kwargs)


def json_source(options: dict, ctx=None):
    return rd.read_json(_paths(options))


def csv_source(options: dict, ctx=None):
    return rd.read_csv(_paths(options))


def text_source(options: dict, ctx=None):
    """raw `file`/`socket` line stream: one row per line, column 'message'
    (bytes/newline_delimited framing analog, config_panel.rs:853-896)."""
    return rd.read_text(_paths(options))


def inline_source(options: dict, ctx=None):
    """`stdin` analog — the functional-test injection point
    (reference functional_test.rs:247-255): rows/table provided in-memory."""
    if "table" in options:
        tbl = options["table"]
        if not isinstance(tbl, pa.Table):
            tbl = pa.Table.from_pydict(tbl)
        return rd.from_arrow(tbl)
    return rd.from_items(list(options["rows"]))


def demo_logs_source(options: dict, ctx=None):
    """`demo_logs` analog (config_panel.rs:794-846): seeded synthetic
    sequence+log rows, generated in parallel. `count` rows across
    `override_num_blocks` blocks; deterministic given both."""
    count = int(options.get("count", 10_000))
    blocks = int(options.get("override_num_blocks", max(1, count // 50_000) or 1))
    seed = int(options.get("seed", datagen.SEED))

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return datagen.generate_batch(0, 0, seed)
        return datagen.generate_batch(int(ids[0]), len(ids), seed)

    return rd.range(count, override_num_blocks=blocks).map_batches(
        gen, batch_format="pyarrow", batch_size=None
    )


SOURCES = {
    "parquet": parquet_source,
    "file": parquet_source,  # file source over a parquet corpus
    "json": json_source,
    "csv": csv_source,
    "text": text_source,
    "stdin": inline_source,
    "inline": inline_source,
    "demo_logs": demo_logs_source,
}

__all__ = ["SOURCES"]
