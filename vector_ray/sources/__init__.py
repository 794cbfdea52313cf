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


_PUSHDOWN_OPS = {
    "==": lambda f, v: f == v,
    "!=": lambda f, v: f != v,
    "<": lambda f, v: f < v,
    "<=": lambda f, v: f <= v,
    ">": lambda f, v: f > v,
    ">=": lambda f, v: f >= v,
    "in": lambda f, v: f.isin(list(v)),
    "is_null": lambda f, v: f.is_null(),
    "is_not_null": lambda f, v: ~f.is_null(),
}


def compile_pushdown(where: list):
    """Compile ``[[column, op, literal], ...]`` (AND-ed) to a pyarrow
    dataset expression for row-group pruning at the read. Ops:
    == != < <= > >= in is_null is_not_null."""
    import pyarrow.dataset as pads

    expr = None
    for clause in where:
        col, op = clause[0], clause[1]
        lit = clause[2] if len(clause) > 2 else None
        if op not in _PUSHDOWN_OPS:
            raise ValueError(
                f"unsupported pushdown op {op!r} (one of {sorted(_PUSHDOWN_OPS)})"
            )
        e = _PUSHDOWN_OPS[op](pads.field(col), lit)
        expr = e if expr is None else (expr & e)
    return expr


def parquet_source(options: dict, ctx=None):
    """`file` source analog for the real corpus: column-pruned parallel
    Parquet read (prune at the read — SURVEY.md 'Optimize for scale').

    ``where`` (list of [column, op, literal] clauses, AND-ed) pushes a
    row filter into the scan: pyarrow skips whole row groups whose
    column statistics exclude the predicate — at 100 TB this is the
    difference between reading a day and reading the year."""
    kwargs = {}
    if options.get("columns"):
        kwargs["columns"] = list(options["columns"])
    if options.get("override_num_blocks"):
        kwargs["override_num_blocks"] = int(options["override_num_blocks"])
    if options.get("where"):
        kwargs["filter"] = compile_pushdown(options["where"])
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
