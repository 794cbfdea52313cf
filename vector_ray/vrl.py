"""Vectorized VRL-subset expression language.

The reference drives filter/route/remap semantics with VRL condition
strings — ``.level == "error"``, ``.status_code >= 400``,
``exists(.user_id)``, ``contains(string!(.message), "error")``,
``match(.message, r'ERROR|FATAL')``, ``to_int(.status) ?? 200``
(ui config_panel.rs:1548-1599, config/demo.toml:16-21,
dev/configs/production/vector.toml:24-39). This module implements that
observed subset as a compiler: condition string → closure over a
``pyarrow.Table`` evaluating with ``pyarrow.compute`` kernels — one
vectorized pass per batch, never a Python loop over rows.

Grammar (precedence low→high):

    expr     := coalesce
    coalesce := or ( '??' or )*
    or       := and ( '||' and )*
    and      := not ( '&&' not )*
    not      := '!' not | cmp
    cmp      := add ( ('=='|'!='|'>='|'<='|'>'|'<') add )?
    add      := mul ( ('+'|'-') mul )*
    mul      := unary ( ('*'|'/'|'%') unary )*
    unary    := '-' unary | primary
    primary  := NUMBER | STRING | REGEX | 'true' | 'false' | 'null'
              | FIELD | IDENT '!'? '(' args ')' | '(' expr ')'
    FIELD    := '.' ident ( '.' ident )*      # maps to the column "a.b"
"""

from __future__ import annotations

import re
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["compile_expr", "compile_predicate", "VrlError"]


class VrlError(ValueError):
    pass


# ---------------------------------------------------------------------------
# base64 — fully vectorized (numpy gather over per-row 3-byte groups);
# matches SQL to_base64/from_base64 including '=' padding. decode is
# VRL-fallible: a malformed row yields null, never an exception.
# ---------------------------------------------------------------------------

_B64_ALPHABET = (
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
)


def _b64_buffers(col: pa.Array):
    """(data uint8, offsets int64, null mask) of a string array. The
    offsets are ABSOLUTE into the (possibly shared) data buffer — a
    sliced input keeps its non-zero base offset, so consumers must
    index data via the offsets, never scan the buffer from 0."""
    import numpy as np

    arr = pc.cast(col, pa.large_binary())
    null_mask = np.asarray(pc.is_null(arr))
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], np.int64, len(arr) + 1 + arr.offset)[
        arr.offset:
    ]
    data = (
        np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    return data, off, null_mask


def _bytes_to_string_nullable(
    n: int, validity, out_off, out_data
) -> pa.Array:
    """Assemble decoded bytes into a STRING array, nulling any row whose
    bytes are not valid UTF-8 (decoded base64/percent-escapes can carry
    arbitrary binary). Hot path: one bulk cast that validates; the
    per-row re-check only runs when some row actually is invalid."""
    import numpy as np

    bin_arr = pa.Array.from_buffers(
        pa.large_binary(),
        n,
        [
            pa.py_buffer(np.packbits(validity, bitorder="little").tobytes()),
            pa.py_buffer(out_off.tobytes()),
            pa.py_buffer(out_data.tobytes()),
        ],
    )
    try:
        return pc.cast(pc.cast(bin_arr, pa.large_string()), pa.string())
    except pa.ArrowInvalid:
        vals = bin_arr.to_pylist()
        out = []
        for b in vals:
            if b is None:
                out.append(None)
            else:
                try:
                    out.append(b.decode("utf-8"))
                except UnicodeDecodeError:
                    out.append(None)
        return pa.array(out, pa.string())


def _b64_encode_array(col: pa.Array) -> pa.Array:
    import numpy as np

    chars = np.frombuffer(_B64_ALPHABET, np.uint8)
    data, off, null_mask = _b64_buffers(col)
    n = len(off) - 1
    lens = np.diff(off)
    groups = (lens + 2) // 3  # 3-byte input groups per row
    total = int(groups.sum())
    if total == 0:
        out_data = np.empty(0, np.uint8)
    else:
        row = np.repeat(np.arange(n), groups)
        gstart = np.concatenate([[0], np.cumsum(groups)[:-1]])
        k = np.arange(total) - np.repeat(gstart, groups)
        s = off[:-1][row] + 3 * k
        rem = lens[row] - 3 * k  # 1, 2, or 3 input bytes in this group
        top = max(len(data) - 1, 0)
        b0 = data[s].astype(np.int32)
        b1 = np.where(rem > 1, data[np.minimum(s + 1, top)], 0).astype(np.int32)
        b2 = np.where(rem > 2, data[np.minimum(s + 2, top)], 0).astype(np.int32)
        quad = np.empty((total, 4), np.uint8)
        quad[:, 0] = chars[b0 >> 2]
        quad[:, 1] = chars[((b0 & 3) << 4) | (b1 >> 4)]
        quad[:, 2] = np.where(
            rem > 1, chars[((b1 & 15) << 2) | (b2 >> 6)], ord("=")
        )
        quad[:, 3] = np.where(rem > 2, chars[b2 & 63], ord("="))
        out_data = quad.reshape(-1)
    out_off = np.concatenate([[0], np.cumsum(4 * groups)]).astype(np.int64)
    out = pa.Array.from_buffers(
        pa.large_string(),
        n,
        [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(out_data.tobytes())],
    )
    res = pc.cast(out, pa.string())
    if null_mask.any():
        res = pc.if_else(pa.array(null_mask), pa.nulls(n, pa.string()), res)
    return res


def _b64_decode_array(col: pa.Array) -> pa.Array:
    import numpy as np

    rev = np.full(256, 255, np.uint8)
    rev[np.frombuffer(_B64_ALPHABET, np.uint8)] = np.arange(64, dtype=np.uint8)
    PAD = 254
    rev[ord("=")] = PAD
    data, off, null_mask = _b64_buffers(col)
    n = len(off) - 1
    lens = np.diff(off)
    bad_row = (lens % 4 != 0) | null_mask
    groups = np.where(bad_row, 0, lens // 4)
    total = int(groups.sum())
    if total == 0:
        out_data = np.empty(0, np.uint8)
        out_lens = np.zeros(n, np.int64)
    else:
        row = np.repeat(np.arange(n), groups)
        gstart = np.concatenate([[0], np.cumsum(groups)[:-1]])
        k = np.arange(total) - np.repeat(gstart, groups)
        s = off[:-1][row] + 4 * k
        c = rev[
            np.stack([data[s], data[s + 1], data[s + 2], data[s + 3]], axis=1)
        ].astype(np.int32)
        last = k == (groups[row] - 1)
        pads = (c[:, 2] == PAD).astype(np.int64) + (c[:, 3] == PAD).astype(
            np.int64
        )
        # '=' legal only at the tail of the LAST group, and c2='=' forces
        # c3='='; 255 is a non-alphabet byte anywhere
        bad_group = (
            (c == 255).any(axis=1)
            | (c[:, 0] == PAD)
            | (c[:, 1] == PAD)
            | ((c[:, 2] == PAD) & (c[:, 3] != PAD))
            | ((pads > 0) & ~last)
        )
        if bad_group.any():
            np.logical_or.at(bad_row, row[bad_group], True)
        cc = np.where(c == PAD, 0, c)
        tri = np.empty((total, 3), np.uint8)
        tri[:, 0] = (cc[:, 0] << 2) | (cc[:, 1] >> 4)
        tri[:, 1] = ((cc[:, 1] & 15) << 4) | (cc[:, 2] >> 2)
        tri[:, 2] = ((cc[:, 2] & 3) << 6) | cc[:, 3]
        glen = np.where(last, 3 - pads, 3)
        keep = np.arange(3)[None, :] < glen[:, None]
        keep &= ~bad_row[row][:, None]  # drop every group of a bad row
        out_data = tri[keep]
        out_lens = np.zeros(n, np.int64)
        np.add.at(out_lens, row, glen * ~bad_row[row])
    out_off = np.concatenate([[0], np.cumsum(out_lens)]).astype(np.int64)
    return _bytes_to_string_nullable(n, ~bad_row, out_off, out_data)


def _url_decode_array(col: pa.Array) -> pa.Array:
    """Vectorized percent-decoding (+ form-encoding '+' → space): every
    valid %XX collapses to its byte, an invalid escape ('%' without two
    hex digits, or spanning a row end) stays literal — the lenient
    browser/VRL behavior."""
    import numpy as np

    hexval = np.full(256, 255, np.uint8)
    for i, ch in enumerate(b"0123456789abcdef"):
        hexval[ch] = i
    for i, ch in enumerate(b"0123456789ABCDEF"):
        hexval[ch] = i
    data, off, null_mask = _b64_buffers(col)
    # rebase to THIS array's byte range: a sliced input's offsets start
    # past 0, and bytes outside [off[0], off[-1]) belong to other rows
    data = data[off[0]: off[-1]]
    off = off - off[0]
    n = len(off) - 1
    lens = np.diff(off)
    out = np.where(data == ord("+"), np.uint8(ord(" ")), data)
    idx = np.flatnonzero(data == ord("%"))
    removed = np.zeros(n, np.int64)
    keep = np.ones(len(data), bool)
    if len(idx):
        row = np.searchsorted(off, idx, "right") - 1
        top = max(len(data) - 1, 0)
        h1 = hexval[data[np.minimum(idx + 1, top)]]
        h2 = hexval[data[np.minimum(idx + 2, top)]]
        ok = (idx + 2 < off[row + 1]) & (h1 != 255) & (h2 != 255)
        vidx = idx[ok]
        out[vidx] = (h1[ok] << np.uint8(4)) | h2[ok]
        keep[vidx + 1] = False
        keep[vidx + 2] = False
        np.add.at(removed, row[ok], 2)
    out_data = out[keep]
    out_off = np.concatenate([[0], np.cumsum(lens - removed)]).astype(np.int64)
    return _bytes_to_string_nullable(n, ~null_mask, out_off, out_data)


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<regex>r'(?:[^'\\]|\\.)*'|r"(?:[^"\\]|\\.)*")
  | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<number>\d+\.\d+|\d+)
  | (?P<field>\.[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
  | (?P<op>\?\?|\|\||&&|==|!=|>=|<=|[()><!,+\-*/%])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*!?)
    """,
    re.X,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise VrlError(f"bad token at {pos!r} in {src!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


# ---------------------------------------------------------------------------
# AST → closure compilation. Every node compiles to fn(table) -> Array|scalar.
# pc kernels broadcast python scalars, so mixed scalar/array ops are free.
# ---------------------------------------------------------------------------

Value = Any  # pa.ChunkedArray | pa.Array | python scalar
Compiled = Callable[[pa.Table], Value]


def _col(table: pa.Table, name: str) -> Value:
    if name in table.column_names:
        return table[name]
    return pa.nulls(table.num_rows)  # absent field → null column (VRL-ish)


_CMP = {
    "==": pc.equal,
    "!=": pc.not_equal,
    ">=": pc.greater_equal,
    "<=": pc.less_equal,
    ">": pc.greater,
    "<": pc.less,
}
def _mod(a: Value, b: Value) -> Value:
    """Truncated remainder (VRL / SQL semantics: -7 % 3 == -1). Arrow's
    integer divide already truncates; float quotients are trunc'd
    explicitly so float and int operands agree with the SQL oracle."""
    q = pc.divide(a, b)
    qt = q.type if hasattr(q, "type") else None
    if (qt is not None and pa.types.is_floating(qt)) or isinstance(q, float):
        q = pc.trunc(q)
    return pc.subtract(a, pc.multiply(q, b))


_ARITH = {
    "+": pc.add,
    "-": pc.subtract,
    "*": pc.multiply,
    "/": pc.divide,
    "%": _mod,
}


def _is_stringy(v: Value) -> bool:
    if isinstance(v, str):
        return True
    t = getattr(v, "type", None)
    return t is not None and (
        pa.types.is_string(t) or pa.types.is_large_string(t)
    )


def _add_or_concat(a: Value, b: Value) -> Value:
    """VRL `+`: numeric addition, or string CONCATENATION when both
    sides are strings (null if either side is null, like SQL ||).
    Mixed string/number is a type error upstream — raise, don't cast."""
    sa, sb = _is_stringy(a), _is_stringy(b)
    if sa and sb:
        if isinstance(a, str):
            a = pa.scalar(a, pa.string())
        if isinstance(b, str):
            b = pa.scalar(b, pa.string())
        return pc.binary_join_element_wise(
            a, b, pa.scalar("", pa.string()), null_handling="emit_null"
        )
    if sa or sb:
        raise VrlError("'+' between a string and a non-string operand")
    return pc.add(a, b)


def _try_to_int(v: Value) -> Value:
    """to_int(x): null where not parseable (VRL's fallible to_int)."""
    if isinstance(v, (int, float)):
        return int(v)
    arr = v
    t = arr.type if hasattr(arr, "type") else None
    if t is not None and (pa.types.is_integer(t) or pa.types.is_floating(t)):
        return pc.cast(arr, pa.int64(), safe=False)
    s = pc.cast(arr, pa.string())
    ok = pc.match_substring_regex(s, r"^-?\d+$")
    cleaned = pc.if_else(pc.fill_null(ok, False), s, pa.scalar(None, pa.string()))
    return pc.cast(cleaned, pa.int64())


def _fn_call(name: str, args: list[Compiled]) -> Compiled:
    fallible = name.endswith("!")
    base = name.rstrip("!")

    if base == "exists":
        inner = args[0]
        return lambda t: pc.is_valid(inner(t))
    if base == "is_null":
        inner = args[0]
        return lambda t: pc.is_null(inner(t))
    if base == "string":
        inner = args[0]
        return lambda t: pc.cast(inner(t), pa.string())
    if base == "to_int":
        inner = args[0]
        if fallible:
            return lambda t: pc.cast(inner(t), pa.int64(), safe=False)
        return lambda t: _try_to_int(inner(t))
    if base == "to_float":
        inner = args[0]
        return lambda t: pc.cast(inner(t), pa.float64(), safe=not fallible)
    if base == "contains":
        s, sub = args
        return lambda t: pc.match_substring(s(t), _as_py_str(sub))
    if base == "starts_with":
        s, sub = args
        return lambda t: pc.starts_with(s(t), _as_py_str(sub))
    if base == "ends_with":
        s, sub = args
        return lambda t: pc.ends_with(s(t), _as_py_str(sub))
    if base == "match":
        s, pat = args
        return lambda t: pc.match_substring_regex(s(t), _as_py_str(pat))
    if base == "length":
        inner = args[0]

        def _length(t: pa.Table) -> Value:
            v = inner(t)
            typ = v.type if hasattr(v, "type") else None
            if typ is not None and (pa.types.is_list(typ) or pa.types.is_large_list(typ)):
                return pc.list_value_length(v)
            return pc.utf8_length(pc.cast(v, pa.string()))

        return _length
    if base == "upcase":
        inner = args[0]
        return lambda t: pc.utf8_upper(inner(t))
    if base == "downcase":
        inner = args[0]
        return lambda t: pc.utf8_lower(inner(t))
    if base == "replace":
        s, pat, rep = args
        # VRL replace(): a regex literal (r"...") substitutes by pattern,
        # a plain string substitutes the LITERAL substring
        if getattr(pat, "is_regex", False):
            return lambda t: pc.replace_substring_regex(
                s(t), pattern=_as_py_str(pat), replacement=_as_py_str(rep)
            )
        return lambda t: pc.replace_substring(
            s(t), pattern=_as_py_str(pat), replacement=_as_py_str(rep)
        )
    if base == "redact":
        # VRL redact(value, filter...) — PII scrubbing (Vector's redact
        # transform/function). Each filter is a named builtin class or a
        # regex; matches are replaced with "[REDACTED]". Vectorized via
        # RE2 (pc.replace_substring_regex), same engine DuckDB uses, so
        # oracle parity is exact.
        named = {
            "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
            "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
            "us_ssn": r"\b\d{3}-\d{2}-\d{4}\b",
            "digits": r"\d+",
        }
        s = args[0]
        pats = [named.get(_as_py_str(a), _as_py_str(a)) for a in args[1:]]

        def _redact(t: pa.Table) -> Value:
            v = pc.cast(s(t), pa.string())
            for p in pats:
                v = pc.replace_substring_regex(
                    v, pattern=p, replacement="[REDACTED]"
                )
            return v

        return _redact
    if base == "slice":
        s, start, stop = args
        return lambda t: pc.utf8_slice_codeunits(
            pc.cast(s(t), pa.string()),
            start=int(start(pa.table({}))),
            stop=int(stop(pa.table({}))),
        )
    if base in ("trim", "strip"):
        inner = args[0]
        return lambda t: pc.utf8_trim_whitespace(pc.cast(inner(t), pa.string()))
    if base == "split":
        s, sep = args
        return lambda t: pc.split_pattern(
            pc.cast(s(t), pa.string()), pattern=_as_py_str(sep)
        )
    if base == "now":
        # wall-clock timestamp (dev/configs/production/vector.toml:24-30
        # usage); inherently nondeterministic — excluded from oracles
        import datetime

        return lambda t: pa.scalar(
            datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None),
            pa.timestamp("us"),
        )
    if base == "parse_timestamp":
        # VRL parse_timestamp(value, format) with chrono %-codes →
        # vectorized pc.strptime. Plain form is fallible (unparseable →
        # null); `parse_timestamp!` raises on the first bad value.
        s, fmt = args
        fmt_str = _as_py_str(fmt)
        return lambda t: pc.strptime(
            pc.cast(s(t), pa.string()),
            format=fmt_str,
            unit="us",
            error_is_null=not fallible,
        )
    if base == "format_timestamp":
        s, fmt = args
        fmt_str = _as_py_str(fmt)

        def _format_ts(t: pa.Table) -> Value:
            v = s(t)
            # arrow strftime prints fractional seconds inside %S for
            # sub-second units; chrono/VRL/SQL %S is integer seconds —
            # truncate unless the format asks for %f explicitly
            if "%f" not in fmt_str and hasattr(v, "type") and pa.types.is_timestamp(v.type):
                v = pc.cast(v, pa.timestamp("s"), safe=False)
            return pc.strftime(v, format=fmt_str)

        return _format_ts
    if base == "url_decode":
        inner = args[0]

        def _urldec(t: pa.Table) -> Value:
            col = pc.cast(inner(t), pa.string())
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return _url_decode_array(col)

        return _urldec
    if base in ("encode_base64", "decode_base64"):
        inner = args[0]
        fn = _b64_encode_array if base == "encode_base64" else _b64_decode_array

        def _b64(t: pa.Table, _fn=fn) -> Value:
            col = pc.cast(inner(t), pa.string())
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            res = _fn(col)
            if fallible:
                # decode_base64!: a null produced from NON-null input
                # is a malformed row — raise like the other `!` forms
                broke = pc.and_(pc.is_null(res), pc.is_valid(col))
                if pc.any(broke).as_py():
                    i = pc.index(broke, True).as_py()
                    raise VrlError(
                        f"{base}!: invalid input {col[i].as_py()!r}"
                    )
            return res

        return _b64
    if base in ("md5", "sha1", "sha256", "sha512"):
        import hashlib

        algo = getattr(hashlib, base)
        inner = args[0]

        def _hash(t: pa.Table) -> Value:
            col = pc.cast(inner(t), pa.string())
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            return pa.array(
                [
                    algo(s.encode()).hexdigest() if s is not None else None
                    for s in col.to_pylist()
                ],
                pa.string(),
            )

        return _hash
    if base == "strip_whitespace":
        inner = args[0]
        return lambda t: pc.utf8_trim_whitespace(pc.cast(inner(t), pa.string()))
    if base == "truncate":
        # VRL truncate(s, limit): cut to at most `limit` characters
        inner, limit = args[0], args[1]
        nchars = int(_as_py_num(limit))
        return lambda t: pc.utf8_slice_codeunits(
            pc.cast(inner(t), pa.string()), 0, nchars
        )
    if base == "to_string":
        inner = args[0]
        return lambda t: pc.cast(inner(t), pa.string(), safe=False)
    if base == "to_bool":
        inner = args[0]

        def _to_bool(t: pa.Table) -> Value:
            v = inner(t)
            if hasattr(v, "type") and (
                pa.types.is_string(v.type) or pa.types.is_large_string(v.type)
            ):
                lowered = pc.utf8_lower(v)
                true_m = pc.is_in(
                    lowered, value_set=pa.array(["true", "t", "yes", "y", "1"])
                )
                false_m = pc.is_in(
                    lowered, value_set=pa.array(["false", "f", "no", "n", "0"])
                )
                out = pc.if_else(
                    true_m,
                    pa.scalar(True),
                    pc.if_else(false_m, pa.scalar(False), pa.scalar(None, pa.bool_())),
                )
                if fallible:
                    bad = pc.and_(pc.invert(pc.is_null(v)), pc.is_null(out))
                    if pc.any(bad).as_py():
                        raise VrlError("to_bool!: unparseable boolean string")
                return out
            return pc.cast(v, pa.bool_(), safe=False)

        return _to_bool
    if base == "abs":
        inner = args[0]
        return lambda t: pc.abs(inner(t))
    if base == "round":
        inner = args[0]
        return lambda t: pc.round(inner(t))
    if base == "floor":
        inner = args[0]
        return lambda t: pc.floor(inner(t))
    if base == "ceil":
        inner = args[0]
        return lambda t: pc.ceil(inner(t))
    if base == "to_unix_timestamp":
        # VRL to_unix_timestamp(ts[, unit]) — timestamp → integer epoch
        # count, FLOOR semantics like SQL epoch() (an Arrow timestamp
        # downcast truncates toward zero, which is one unit late for
        # pre-epoch fractional values).
        inner = args[0]
        unit = _as_py_str(args[1]) if len(args) > 1 else "seconds"
        arrow_unit = _UNIX_UNITS.get(unit)
        if arrow_unit is None:
            raise VrlError(
                f"to_unix_timestamp: unit must be one of {sorted(_UNIX_UNITS)}"
            )

        def _to_unix(t: pa.Table) -> Value:
            n_us = pc.cast(
                pc.cast(inner(t), pa.timestamp("us"), safe=False), pa.int64()
            )
            if arrow_unit == "ns":
                return pc.multiply(n_us, pa.scalar(1000, pa.int64()))
            f = pa.scalar({"s": 1_000_000, "ms": 1_000, "us": 1}[arrow_unit], pa.int64())
            q = pc.divide(n_us, f)  # truncates toward zero
            r = pc.subtract(n_us, pc.multiply(q, f))
            neg_frac = pc.and_(
                pc.not_equal(r, pa.scalar(0, pa.int64())),
                pc.less(n_us, pa.scalar(0, pa.int64())),
            )
            return pc.subtract(q, pc.cast(pc.fill_null(neg_frac, False), pa.int64()))

        return _to_unix
    if base == "from_unix_timestamp":
        # inverse conversion: integer epoch count → timestamp(us).
        # safe=False on the final cast so sub-microsecond nanosecond
        # counts TRUNCATE instead of raising ArrowInvalid.
        inner = args[0]
        unit = _as_py_str(args[1]) if len(args) > 1 else "seconds"
        arrow_unit = _UNIX_UNITS.get(unit)
        if arrow_unit is None:
            raise VrlError(
                f"from_unix_timestamp: unit must be one of {sorted(_UNIX_UNITS)}"
            )
        return lambda t: pc.cast(
            pc.cast(
                pc.cast(inner(t), pa.int64(), safe=False),
                pa.timestamp(arrow_unit),
            ),
            pa.timestamp("us"),
            safe=False,
        )
    if base == "parse_duration":
        # VRL parse_duration(value, unit): "250ms" / "1.5s" / "2h" →
        # the duration expressed in `unit`. Vectorized: one regex
        # extract (number + unit token), factor lookup via index_in.
        inner = args[0]
        target = _as_py_str(args[1])
        if target not in _DURATION_FACTORS:
            raise VrlError(
                f"parse_duration: unit must be one of {sorted(_DURATION_FACTORS)}"
            )
        tfac = _DURATION_FACTORS[target]
        unit_arr = pa.array(list(_DURATION_FACTORS), pa.string())
        fac_arr = pa.array(
            [_DURATION_FACTORS[u] for u in _DURATION_FACTORS], pa.float64()
        )

        def _dur(t: pa.Table) -> Value:
            s = pc.cast(inner(t), pa.string())
            ex = pc.extract_regex(
                s, r"^\s*(?P<num>\d+(?:\.\d+)?)\s*(?P<unit>ns|us|µs|ms|s|m|h|d)\s*$"
            )
            num = pc.cast(pc.struct_field(ex, "num"), pa.float64())
            unit = pc.struct_field(ex, "unit")
            unit = pc.replace_substring(unit, "µs", "us")
            fac = pc.take(fac_arr, pc.index_in(unit, value_set=unit_arr))
            out = pc.divide(pc.multiply(num, fac), pa.scalar(tfac, pa.float64()))
            if fallible:
                bad = pc.and_(pc.invert(pc.is_null(s)), pc.is_null(out))
                if len(bad) and pc.any(bad).as_py():
                    raise VrlError("parse_duration!: unparseable duration")
            return out

        return _dur
    if base == "ip_cidr_contains":
        # VRL ip_cidr_contains(cidr, ip) — IPv4 membership, vectorized:
        # one extract_regex splits every dotted quad into 4 int fields,
        # integer math builds the u32, one mask-and-compare. The CIDR
        # must be a string literal (the overwhelmingly common form).
        # Unparseable/invalid IPs: null in the plain form (drops out of
        # filters, mirroring SQL null semantics); `!` form raises.
        cidr = _as_py_str(args[0])
        inner = args[1]
        try:
            base_str, prefix_s = cidr.split("/")
            prefix = int(prefix_s)
            octets = [int(x) for x in base_str.split(".")]
            if len(octets) != 4 or not all(0 <= o <= 255 for o in octets):
                raise ValueError
            if not 0 <= prefix <= 32:
                raise ValueError
        except ValueError:
            raise VrlError(f"ip_cidr_contains: invalid CIDR literal {cidr!r}")
        mask = 0xFFFFFFFF ^ ((1 << (32 - prefix)) - 1) if prefix else 0
        want = (
            ((octets[0] << 24) | (octets[1] << 16) | (octets[2] << 8) | octets[3])
            & mask
        )

        def _cidr(t: pa.Table) -> Value:
            ips = pc.cast(inner(t), pa.string())
            u = _ipv4_to_u32(ips)
            if fallible:
                bad = pc.and_(pc.invert(pc.is_null(ips)), pc.is_null(u))
                if len(bad) and pc.any(bad).as_py():
                    raise VrlError("ip_cidr_contains!: invalid IPv4 address")
            return pc.equal(
                pc.bit_wise_and(u, pa.scalar(mask, pa.int64())),
                pa.scalar(want, pa.int64()),
            )

        return _cidr
    raise VrlError(f"unknown function {name}()")


_UNIX_UNITS = {
    "seconds": "s",
    "milliseconds": "ms",
    "microseconds": "us",
    "nanoseconds": "ns",
}

_DURATION_FACTORS = {  # in seconds
    "ns": 1e-9,
    "us": 1e-6,
    "ms": 1e-3,
    "s": 1.0,
    "m": 60.0,
    "h": 3600.0,
    "d": 86400.0,
}

_IPV4_OCTET = r"25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9]"
# strict octets: 0-255 with NO leading zeros (VRL/Rust IP parsing
# rejects "010.064.0.1" as invalid — octal ambiguity)
_IPV4_RE = (
    rf"^(?P<a>{_IPV4_OCTET})\.(?P<b>{_IPV4_OCTET})"
    rf"\.(?P<c>{_IPV4_OCTET})\.(?P<d>{_IPV4_OCTET})$"
)


def _ipv4_to_u32(col: "pa.Array | pa.ChunkedArray"):
    """Dotted-quad strings → int64 of the u32 value; null when the
    string is not a valid IPv4 address. Fully vectorized (one regex
    extract + integer arithmetic)."""
    ex = pc.extract_regex(col, _IPV4_RE)
    parts = [
        pc.cast(pc.struct_field(ex, f), pa.int64()) for f in ("a", "b", "c", "d")
    ]
    valid = None
    for p in parts:
        ok = pc.less_equal(p, pa.scalar(255, pa.int64()))
        valid = ok if valid is None else pc.and_(valid, ok)
    val = parts[0]
    for p in parts[1:]:
        val = pc.add(pc.multiply(val, pa.scalar(256, pa.int64())), p)
    return pc.if_else(pc.fill_null(valid, False), val, pa.scalar(None, pa.int64()))


def _as_py_str(compiled: Compiled) -> str:
    v = compiled(pa.table({}))
    if not isinstance(v, str):
        raise VrlError("expected a string literal argument")
    return v


def _as_py_num(compiled: Compiled) -> float:
    v = compiled(pa.table({}))
    if hasattr(v, "as_py"):
        v = v.as_py()
    if not isinstance(v, (int, float)) or isinstance(v, bool):
        raise VrlError("expected a numeric literal argument")
    return float(v)


class _Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks = _tokenize(src)
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def expect(self, text: str) -> None:
        kind, val = self.next()
        if val != text:
            raise VrlError(f"expected {text!r}, got {val!r} in {self.src!r}")

    # precedence-climbing
    def parse(self) -> Compiled:
        e = self.coalesce()
        if self.peek()[0] != "eof":
            raise VrlError(f"trailing input {self.peek()[1]!r} in {self.src!r}")
        return e

    def coalesce(self) -> Compiled:
        left = self.or_()
        while self.peek()[1] == "??":
            self.next()
            right = self.or_()
            l, r = left, right

            def _coal(t: pa.Table, l=l, r=r) -> Value:
                lv, rv = l(t), r(t)
                if not hasattr(lv, "type"):
                    return lv if lv is not None else rv
                if not hasattr(rv, "type"):
                    rv = pa.scalar(rv, lv.type)
                return pc.coalesce(lv, rv)

            left = _coal
        return left

    def or_(self) -> Compiled:
        left = self.and_()
        while self.peek()[1] == "||":
            self.next()
            right = self.and_()
            l, r = left, right
            left = lambda t, l=l, r=r: pc.or_kleene(_boolish(l(t)), _boolish(r(t)))
        return left

    def and_(self) -> Compiled:
        left = self.not_()
        while self.peek()[1] == "&&":
            self.next()
            right = self.not_()
            l, r = left, right
            left = lambda t, l=l, r=r: pc.and_kleene(_boolish(l(t)), _boolish(r(t)))
        return left

    def not_(self) -> Compiled:
        if self.peek()[1] == "!":
            self.next()
            inner = self.not_()
            return lambda t: pc.invert(_boolish(inner(t)))
        return self.cmp()

    def cmp(self) -> Compiled:
        left = self.add()
        op = self.peek()[1]
        if op in _CMP:
            self.next()
            right = self.add()
            fn, l, r = _CMP[op], left, right
            ordering = op in (">", ">=", "<", "<=")

            def _compare(t: pa.Table, fn=fn, l=l, r=r, op=op) -> Value:
                lv, rv = l(t), r(t)
                # VRL null equality: `null` is a comparable VALUE, not
                # SQL's unknown — `.x == null` is true exactly where x
                # is null (Arrow's kernel would yield all-null → an
                # always-false mask, silently breaking `.x != null`)
                if lv is None or rv is None:
                    if ordering:
                        raise VrlError(
                            f"cannot order against null (op {op})"
                        )
                    if lv is None and rv is None:
                        # per-row mask, not a plain bool — predicate
                        # consumers feed this straight to Table.filter
                        return pa.array(
                            np.full(t.num_rows, op == "==", dtype=bool)
                        )
                    v = rv if lv is None else lv
                    if not hasattr(v, "type"):  # non-null scalar literal
                        return pa.array(
                            np.full(t.num_rows, op == "!=", dtype=bool)
                        )
                    mask = pc.is_null(v)
                    return mask if op == "==" else pc.invert(mask)
                lt = lv.type if hasattr(lv, "type") else None
                if lt is not None and pa.types.is_string(lt) and isinstance(rv, (int, float)):
                    if ordering:
                        # ordering a string column against a number: coerce
                        # the COLUMN to float (lexicographic comparison of
                        # digit strings is silently wrong: "50" > "1000")
                        lv = pc.cast(lv, pa.float64())
                        rv = float(rv)
                    else:
                        rv = str(rv)
                if lt is not None and (pa.types.is_integer(lt) or pa.types.is_floating(lt)) and isinstance(rv, str):
                    if ordering:
                        # VRL raises a type error rather than producing a
                        # lexicographic mask; coerce the literal if it is
                        # numeric, else fail loudly
                        try:
                            rv = float(rv) if ("." in rv or "e" in rv.lower()) else int(rv)
                        except ValueError:
                            raise VrlError(
                                f"cannot order numeric field against "
                                f"non-numeric string {rv!r} (op {op})"
                            )
                    else:
                        lv = pc.cast(lv, pa.string())
                return fn(lv, rv)

            return _compare
        return left

    def add(self) -> Compiled:
        left = self.mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            right = self.mul()
            fn, l, r = _ARITH[op], left, right
            if op == "+":
                left = lambda t, l=l, r=r: _add_or_concat(l(t), r(t))
            else:
                left = lambda t, fn=fn, l=l, r=r: fn(l(t), r(t))
        return left

    def mul(self) -> Compiled:
        left = self.unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            right = self.unary()
            fn, l, r = _ARITH[op], left, right
            left = lambda t, fn=fn, l=l, r=r: fn(l(t), r(t))
        return left

    def unary(self) -> Compiled:
        if self.peek()[1] == "-":
            self.next()
            inner = self.unary()
            return lambda t: pc.negate(inner(t))
        return self.primary()

    def primary(self) -> Compiled:
        kind, val = self.next()
        if kind == "number":
            lit = float(val) if "." in val else int(val)
            return lambda t, lit=lit: lit
        if kind in ("string", "regex"):
            raw = val[1:] if kind == "regex" else val
            quote = raw[0]
            body = raw[1:-1]
            if kind == "regex":
                # raw-string semantics: backslashes are regex syntax;
                # only the quote character is unescaped
                lit = body.replace("\\" + quote, quote)
            else:
                lit = re.sub(r"\\(.)", r"\1", body)
            fn = lambda t, lit=lit: lit  # noqa: E731
            fn.is_regex = kind == "regex"
            return fn
        if kind == "field":
            name = val[1:]
            return lambda t, name=name: _col(t, name)
        if kind == "ident":
            if val in ("true", "false"):
                b = val == "true"
                return lambda t, b=b: b
            if val == "null":
                return lambda t: None
            # function call
            self.expect("(")
            args: list[Compiled] = []
            if self.peek()[1] != ")":
                args.append(self.coalesce())
                while self.peek()[1] == ",":
                    self.next()
                    args.append(self.coalesce())
            self.expect(")")
            return _fn_call(val, args)
        if val == "(":
            e = self.coalesce()
            self.expect(")")
            return e
        raise VrlError(f"unexpected {val!r} in {self.src!r}")


def _boolish(v: Value) -> Value:
    if isinstance(v, bool) or hasattr(v, "type"):
        return v
    raise VrlError(f"expected boolean expression, got {v!r}")


def compile_expr(src: str) -> Compiled:
    """Compile a VRL-subset expression to ``fn(pa.Table) -> Array|scalar``."""
    return _Parser(src).parse()


def compile_predicate(src: str) -> Callable[[pa.Table], pa.ChunkedArray]:
    """Compile a condition to a null-safe boolean mask function.

    Null comparison results count as *not matching* — the reference's
    client-side filter simulation passes events through only on an
    explicit match (ui view.rs:799-830); nulls must not survive a filter.
    """
    expr = compile_expr(src)

    def mask(table: pa.Table):
        m = expr(table)
        if isinstance(m, bool):
            import numpy as np

            return pa.array(np.full(table.num_rows, m))
        m = pc.cast(m, pa.bool_())
        return pc.fill_null(m, False)

    return mask
