"""Framing stage — the byte-stream → event-frame split that Vector's
sources apply before codec decode (framing method list:
ui/src/components/pipeline/config_panel.rs:853-896: newline_delimited,
character_delimited, length_delimited, octet_counting, bytes).

In a Parquet-backed Ray pipeline the "byte stream" is a binary/string
payload column where one row may carry MANY frames (e.g. a socket read,
a file chunk); ``frame`` explodes each payload into one row per frame,
repeating the other columns. Delimiter-based framing is fully
vectorized (one Arrow split + one take). The two length-prefixed
framings are vectorized OVER PAYLOADS: frame offsets are data-dependent
(serial within a payload), so the scan loops over frame ORDINALS — each
iteration advances one frame in every still-active payload with pure
numpy gathers, and the loop count is max-frames-per-payload, not total
frames. Micro-bench (this box, warm, best-of-5, one batch of 10^5
payloads × 3 frames of 2-28 bytes): length_delimited 66 ms vectorized
vs 204 ms per-row Python (3.1×); octet_counting 96 ms vs 175 ms (1.8×)
— the gap widens as frames shrink (Python cost is per frame, vector
cost is per ordinal). A malformed or >7-digit-prefix octet-counting
payload falls back to the per-row scanner for exact legacy errors.
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
    """Per-row Python fallback scanner (exact legacy error messages;
    also used by the octet-counting fast path to re-scan payloads that
    fail its bounded-prefix assumptions)."""
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


def _payload_buffer(t: pa.Table, field: str):
    """(data bytes, start/end offsets per row) for a binary payload
    column — zero-copy views over the Arrow buffers; null rows get an
    empty [start, start) range (0 frames, like the legacy scan)."""
    col = t[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not (pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type)):
        col = pc.cast(col, pa.binary())
    col = pc.fill_null(col, b"")
    col = pc.cast(col, pa.large_binary())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset : col.offset + len(col) + 1
    ]
    data = np.frombuffer(col.buffers()[2] or b"", dtype=np.uint8)
    return data, offsets[:-1].copy(), offsets[1:].copy()


def _gather_slices(data: np.ndarray, starts: np.ndarray, lengths: np.ndarray):
    """Binary array of data[starts[i] : starts[i]+lengths[i]] slices.
    REQUIRES the slices sorted by start and non-overlapping (the framing
    scanners guarantee both): the slice bytes are then extracted with a
    single boolean-mask pass built by a bincount diff-trick — no
    per-slice Python, no per-byte index array."""
    tot = int(lengths.sum())
    if tot == 0:
        values = np.empty(0, np.uint8)
    else:
        n = len(data)
        nz = lengths > 0
        s = starts[nz].astype(np.int64)
        e = s + lengths[nz].astype(np.int64)
        # +1 at each start, -1 at each end; the running sum is 0/1
        # (non-overlapping), so int8 can never overflow. Each index
        # appears at most once as a start and once as an end, so plain
        # scatter assignment/subtraction is exact.
        d = np.zeros(n + 1, np.int8)
        d[s] = 1
        d[e] -= 1
        values = data[np.cumsum(d[:n], dtype=np.int8) > 0]
    off = np.zeros(len(lengths) + 1, np.int64)
    np.cumsum(lengths, out=off[1:])
    arr = pa.Array.from_buffers(
        pa.large_binary(),
        len(lengths),
        [None, pa.py_buffer(off), pa.py_buffer(np.ascontiguousarray(values))],
    )
    return pc.cast(arr, pa.binary())


def _order_frames(num_rows, row_parts, start_parts, len_parts):
    """Concatenate per-iteration (row, start, len) arrays and reorder
    row-major (stable, so frame order within a row is preserved)."""
    rows = np.concatenate(row_parts) if row_parts else np.empty(0, np.int64)
    starts = (
        np.concatenate(start_parts) if start_parts else np.empty(0, np.int64)
    )
    lens = np.concatenate(len_parts) if len_parts else np.empty(0, np.int64)
    order = np.argsort(rows, kind="stable")
    frames_per_row = np.bincount(rows, minlength=num_rows).astype(np.int64)
    return frames_per_row, starts[order], lens[order]


def _frame_length_delimited_vec(t: pa.Table, field: str) -> pa.Table:
    """Vectorized 4-byte big-endian length-prefix framing: the loop is
    over frame ordinals (max frames in any one payload); each iteration
    decodes the next header of EVERY active payload at once."""
    data, pos, ends = _payload_buffer(t, field)
    orig_starts = pos.copy()
    active = np.flatnonzero(ends > pos)
    row_parts: list[np.ndarray] = []
    start_parts: list[np.ndarray] = []
    len_parts: list[np.ndarray] = []
    while len(active):
        p = pos[active]
        e = ends[active]
        done = p == e
        short = (~done) & (p + 4 > e)
        if short.any():
            i = active[short][0]
            raise VrlError(
                f"length_delimited payload has {int(ends[i] - pos[i])} "
                "trailing bytes"
            )
        active = active[~done]
        if not len(active):
            break
        p = pos[active]
        ln = (
            (data[p].astype(np.int64) << 24)
            | (data[p + 1].astype(np.int64) << 16)
            | (data[p + 2].astype(np.int64) << 8)
            | data[p + 3].astype(np.int64)
        )
        over = p + 4 + ln > ends[active]
        if over.any():
            j = int(np.flatnonzero(over)[0])
            i = active[j]
            raise VrlError(
                f"length_delimited frame overruns payload "
                f"(need {int(ln[j])} bytes at offset "
                f"{int(p[j] + 4 - orig_starts[i])}, "
                f"have {int(ends[i] - p[j] - 4)})"
            )
        row_parts.append(active.copy())
        start_parts.append(p + 4)
        len_parts.append(ln)
        pos[active] = p + 4 + ln
    fpr, fs, fl = _order_frames(t.num_rows, row_parts, start_parts, len_parts)
    return _explode(t, field, fpr, _gather_slices(data, fs, fl))


# fast-path window for "<digits> " prefixes: 7 digits + the space
# covers frames up to 10 MB; a longer (still valid) prefix just routes
# that payload to the per-row fallback scanner
_OC_MAX_PREFIX = 8


def _frame_octet_counting_vec(t: pa.Table, field: str) -> pa.Table:
    """Vectorized RFC 6587 octet counting. Fast path assumes the ASCII
    length prefix (digits + one space) fits in ``_OC_MAX_PREFIX`` bytes;
    any payload violating that — or malformed — is re-scanned by the
    per-row legacy scanner so error messages stay identical."""
    data, pos, ends = _payload_buffer(t, field)
    orig_starts = pos.copy()
    active = np.flatnonzero(ends > pos)
    fallback = np.zeros(t.num_rows, dtype=bool)
    row_parts: list[np.ndarray] = []
    start_parts: list[np.ndarray] = []
    len_parts: list[np.ndarray] = []
    while len(active):
        p = pos[active]
        e = ends[active]
        done = p >= e
        active = active[~done]
        if not len(active):
            break
        p = pos[active]
        e = ends[active]
        # gather the next _OC_MAX_PREFIX bytes of each payload (clamped)
        cols = np.arange(_OC_MAX_PREFIX, dtype=np.int64)
        gidx = p[:, None] + cols[None, :]
        valid = gidx < e[:, None]
        m = np.where(valid, data[np.minimum(gidx, len(data) - 1)], 0)
        is_space = (m == 0x20) & valid
        has_space = is_space.any(axis=1)
        sp = np.argmax(is_space, axis=1)  # first space offset
        is_digit = (m >= 0x30) & (m <= 0x39)
        before = cols[None, :] < sp[:, None]
        digits_ok = (is_digit | ~before).all(axis=1) & (sp > 0)
        ok = has_space & digits_ok
        if not ok.all():
            bad_rows = active[~ok]
            fallback[bad_rows] = True
            active = active[ok]
            if not len(active):
                break
            p, e = pos[active], ends[active]
            m, sp = m[ok], sp[ok]
            before = cols[None, :] < sp[:, None]
        ln = np.zeros(len(active), np.int64)
        for j in range(_OC_MAX_PREFIX):
            use = before[:, j]
            ln[use] = ln[use] * 10 + (m[use, j] - 0x30)
        start = p + sp + 1
        over = start + ln > e
        if over.any():
            fallback[active[over]] = True
            keep = ~over
            active, start, ln = active[keep], start[keep], ln[keep]
            if not len(active):
                break
        row_parts.append(active.copy())
        start_parts.append(start)
        len_parts.append(ln)
        pos[active] = start + ln
    fpr, fs, fl = _order_frames(t.num_rows, row_parts, start_parts, len_parts)
    if fallback.any():
        # re-scan malformed/oversized-prefix payloads row-by-row (this
        # raises the legacy VrlError for truly malformed ones); splice
        # their frames in place of whatever the fast path collected
        keep_frames = np.repeat(~fallback, fpr)
        fs, fl = fs[keep_frames], fl[keep_frames]
        fpr = np.where(fallback, 0, fpr)
        base = _gather_slices(data, fs, fl).to_pylist()
        out_frames: list[bytes] = []
        out_fpr = np.zeros(t.num_rows, np.int64)
        cursor = 0
        for i in range(t.num_rows):
            if fallback[i]:
                payload = bytes(data[orig_starts[i] : ends[i]])
                fr = _scan_octet_counting(payload)
                out_frames.extend(fr)
                out_fpr[i] = len(fr)
            else:
                k = int(fpr[i])
                out_frames.extend(base[cursor : cursor + k])
                out_fpr[i] = k
                cursor += k
        return _explode(t, field, out_fpr, pa.array(out_frames, pa.binary()))
    return _explode(t, field, fpr, _gather_slices(data, fs, fl))


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
    if method == "length_delimited":
        return lambda t: _frame_length_delimited_vec(t, field)
    return lambda t: _frame_octet_counting_vec(t, field)


def frame(ds, options: dict, ctx=None):
    """Explode a payload column into one row per frame."""
    fn = compile_frame(options)
    return ds.map_batches(fn, batch_format="pyarrow")
