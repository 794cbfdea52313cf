"""Framing stage — the byte-stream → event-frame split that Vector's
sources apply before codec decode (framing method list:
ui/src/components/pipeline/config_panel.rs:853-896: newline_delimited,
character_delimited, length_delimited, octet_counting, bytes).

In a Parquet-backed Ray pipeline the "byte stream" is a binary/string
payload column where one row may carry MANY frames (e.g. a socket read,
a file chunk); ``frame`` explodes each payload into one row per frame,
repeating the other columns. Delimiter-based framing is fully
vectorized (one Arrow split + one take); the two length-prefixed
framings scan each payload sequentially — frame offsets are
data-dependent, so the scan is inherently serial *within* a payload,
and parallelism comes from Ray distributing payload rows across
batches/workers (documented scale path: keep payloads ≤ a few MB so a
block's scan time stays bounded).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.vrl import VrlError

FRAMING_METHODS = (
    "bytes",
    "newline_delimited",
    "character_delimited",
    "length_delimited",
    "octet_counting",
    "multiline",
)


def _explode(t: pa.Table, field: str, frames_per_row: np.ndarray, flat_frames) -> pa.Table:
    """Repeat non-payload columns per frame and attach the frame column."""
    idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), frames_per_row)
    rest = t.drop_columns([field])
    if not rest.column_names:
        # payload-only table: a zero-column table has num_rows == 0, so
        # take() can't carry the row count — build the result directly
        return pa.table({field: flat_frames})
    out = rest.take(pa.array(idx))
    return out.append_column(field, flat_frames)


def _frame_character_delimited(t: pa.Table, field: str, delimiter: str) -> pa.Table:
    col = t[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    is_binary = pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type)
    s = pc.cast(col, pa.string()) if not is_binary else col
    parts = pc.split_pattern(pc.fill_null(s, "" if not is_binary else b""), delimiter.encode() if is_binary else delimiter)
    parts = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
    # drop a trailing empty frame produced by a payload that ENDS with the
    # delimiter (Vector's framers emit no empty trailing frame)
    flat = parts.flatten()
    lengths = np.diff(np.asarray(parts.offsets, dtype=np.int64))
    sizes = pc.binary_length(flat) if is_binary else pc.utf8_length(flat)
    sizes = np.asarray(sizes, dtype=np.int64)
    keep = np.ones(len(flat), dtype=bool)
    ends = np.cumsum(lengths) - 1  # index of each payload's last frame
    last_empty = ends[(lengths > 0)]
    last_empty = last_empty[sizes[last_empty] == 0]
    keep[last_empty] = False
    adj = lengths.copy()
    adj[(lengths > 0) & (sizes[np.cumsum(lengths) - 1] == 0)] -= 1
    return _explode(t, field, adj, flat.filter(pa.array(keep)))


def _scan_length_delimited(payload: bytes) -> list[bytes]:
    """4-byte big-endian length prefix per frame (Vector's
    length_delimited default)."""
    out = []
    pos, n = 0, len(payload)
    while pos + 4 <= n:
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        pos += 4
        if pos + ln > n:
            raise VrlError(
                f"length_delimited frame overruns payload "
                f"(need {ln} bytes at offset {pos}, have {n - pos})"
            )
        out.append(payload[pos : pos + ln])
        pos += ln
    if pos != n:
        raise VrlError(f"length_delimited payload has {n - pos} trailing bytes")
    return out


def _scan_octet_counting(payload: bytes) -> list[bytes]:
    """RFC 6587 octet counting: ASCII frame length, a space, then the
    frame (syslog over TCP)."""
    out = []
    pos, n = 0, len(payload)
    while pos < n:
        sp = payload.find(b" ", pos)
        if sp < 0:
            raise VrlError("octet_counting payload missing length separator")
        try:
            ln = int(payload[pos:sp])
        except ValueError:
            raise VrlError(
                f"octet_counting bad length prefix {payload[pos:sp]!r}"
            ) from None
        start = sp + 1
        if start + ln > n:
            raise VrlError("octet_counting frame overruns payload")
        out.append(payload[start : start + ln])
        pos = start + ln
    return out


def _frame_scanned(t: pa.Table, field: str, scan) -> pa.Table:
    col = t[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not (pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type)):
        col = pc.cast(col, pa.binary())
    frames_per_row = np.zeros(t.num_rows, dtype=np.int64)
    flat: list[bytes] = []
    for i, payload in enumerate(col.to_pylist()):
        if payload is None:
            continue
        fr = scan(payload)
        frames_per_row[i] = len(fr)
        flat.extend(fr)
    return _explode(t, field, frames_per_row, pa.array(flat, pa.binary()))


def _frame_multiline(t: pa.Table, field: str, start_pattern: str) -> pa.Table:
    """Vector's multiline aggregation (file-source option): lines
    matching ``start_pattern`` begin a new event; following
    non-matching lines (stack-trace continuations) are appended with
    the newline kept. Fully vectorized: one split, one regex match,
    one cumsum for group ids, one list rebuild + join. Groups never
    span payload rows — each payload's first line always starts a
    group — so the unit of stream continuity is the payload row (at
    scale: one file / one socket read per row, the documented framing
    contract)."""
    col = t[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    as_str = pc.cast(col, pa.string())
    lines = pc.split_pattern(as_str, "\n")
    per_row = (
        pc.fill_null(pc.list_value_length(lines), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = lines.flatten()  # null payloads contribute no lines
    if len(flat) == 0:
        return _explode(
            t, field, np.zeros(len(per_row), np.int64),
            pa.array([], pa.string()),
        )
    starts = (
        pc.fill_null(pc.match_substring_regex(flat, start_pattern), False)
        .to_numpy(zero_copy_only=False)
        .astype(bool)
    )
    offsets = np.zeros(len(per_row) + 1, dtype=np.int64)
    np.cumsum(per_row, out=offsets[1:])
    # the first line of every payload opens a group regardless
    starts[offsets[:-1][per_row > 0]] = True
    bounds = np.flatnonzero(starts)
    g_offsets = np.concatenate([bounds, [len(flat)]]).astype(np.int32)
    groups = pa.ListArray.from_arrays(pa.array(g_offsets, pa.int32()), flat)
    frames = pc.binary_join(groups, "\n")
    cs = np.concatenate([[0], np.cumsum(starts)])
    frames_per_row = cs[offsets[1:]] - cs[offsets[:-1]]
    return _explode(t, field, frames_per_row, frames)


def compile_frame(options: dict):
    method = options.get("method", "newline_delimited")
    if method not in FRAMING_METHODS:
        raise VrlError(
            f"unknown framing method {method!r}; one of {FRAMING_METHODS}"
        )
    field = options.get("field", "message")
    if method == "bytes":
        # whole payload is one frame — identity
        return lambda t: t
    if method == "multiline":
        pattern = options.get("start_pattern")
        if not pattern:
            raise VrlError("multiline framing requires start_pattern")
        return lambda t: _frame_multiline(t, field, pattern)
    if method in ("newline_delimited", "character_delimited"):
        delim = options.get("delimiter", "\n")
        if method == "newline_delimited":
            delim = "\n"
        return lambda t: _frame_character_delimited(t, field, delim)
    scan = (
        _scan_length_delimited
        if method == "length_delimited"
        else _scan_octet_counting
    )
    return lambda t: _frame_scanned(t, field, scan)


def frame(ds, options: dict, ctx=None):
    """Explode a payload column into one row per frame."""
    fn = compile_frame(options)
    return ds.map_batches(fn, batch_format="pyarrow")
