"""Encode stage — the sink-side ``encoding.codec`` surface.

Vector sinks declare an output codec (console/file sink forms,
ui/src/components/pipeline/config_panel.rs:1877-1921; codec vocabulary
shared with the source decode list at config_panel.rs:853-896). This
stage is the encode twin of the decode ops in stages/core.py /
stages/native_codec.py: it serializes selected columns into a single
``message`` payload column that a file/text/socket sink would emit.

Codecs:
  * ``text``        — pass one column through as the payload
  * ``json``        — one JSON object per row (vectorized via polars
                      ``struct.json_encode`` — no per-row Python)
  * ``logfmt``      — ``k=v`` pairs joined by spaces (vectorized Arrow
                      string assembly; values containing spaces/quotes
                      are not escaped — same simple-value scope as the
                      logfmt *decode* op)
  * ``native_json`` — Vector native_json envelope ``{"log": {...}}``
                      (round-trips through the parse_native_json op)
  * ``native``      — protobuf Event wire format (round-trips through
                      parse_native; see stages/native_codec.py)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.vrl import VrlError

CODECS = ("text", "json", "logfmt", "native_json", "native")


def _json_encode_rows(t: pa.Table, fields: list[str]):
    """Vectorized per-row JSON objects of ``fields`` via polars."""
    import polars as pl

    df = pl.from_arrow(t.select(fields))
    out = df.select(pl.struct(fields).struct.json_encode().alias("m"))
    arr = out.to_arrow()["m"]
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return pc.cast(arr, pa.string())


def compile_encode(options: dict):
    codec = options.get("codec", "json")
    if codec not in CODECS:
        raise VrlError(f"unknown encode codec {codec!r}; one of {CODECS}")
    out = options.get("out", "message")
    fields = options.get("fields")

    if codec == "text":
        field = options.get("field") or (fields or ["message"])[0]

        def _text(t: pa.Table) -> pa.Table:
            col = pc.cast(t[field], pa.string())
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            return t.append_column(out, col) if out != field else t

        return _text

    if codec == "json":

        def _json(t: pa.Table) -> pa.Table:
            cols = fields or t.column_names
            return t.append_column(out, _json_encode_rows(t, cols))

        return _json

    if codec == "logfmt":

        def _logfmt(t: pa.Table) -> pa.Table:
            cols = fields or t.column_names
            parts: list = []
            for i, c in enumerate(cols):
                if i:
                    parts.append(" ")
                parts.append(f"{c}=")
                v = pc.cast(t[c], pa.string())
                parts.append(pc.fill_null(v, "null"))
            joined = pc.binary_join_element_wise(
                *[p if isinstance(p, str) else p for p in parts], ""
            )
            joined = (
                joined.combine_chunks()
                if isinstance(joined, pa.ChunkedArray)
                else joined
            )
            return t.append_column(out, joined)

        return _logfmt

    if codec == "native_json":

        def _native_json(t: pa.Table) -> pa.Table:
            cols = fields or t.column_names
            inner = _json_encode_rows(t, cols)
            line = pc.binary_join_element_wise('{"log": ', inner, "}", "")
            line = line.combine_chunks() if isinstance(line, pa.ChunkedArray) else line
            return t.append_column(out, line)

        return _native_json

    # codec == "native"
    def _native(t: pa.Table) -> pa.Table:
        from vector_ray.stages.native_codec import encode_log_rows

        cols = fields or t.column_names
        return encode_log_rows(t, keys=cols, out=out)

    return _native


def encode(ds, options: dict, ctx=None):
    """Serialize columns into a payload column (sink-side codec)."""
    fn = compile_encode(options)
    return ds.map_batches(fn, batch_format="pyarrow")
