"""Stateless per-batch transforms: remap, filter, route, sample.

All are vectorized ``map_batches(batch_format="pyarrow")`` stages — the
Ray-Data mapping of the reference's remap/filter/route/sample transforms
(ui palette.rs:127-133; option forms config_panel.rs:1420-1667).
"""

from __future__ import annotations

import re
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.vrl import compile_expr, compile_predicate, VrlError

ROUTE_COLUMN = "__route"
UNMATCHED = "_unmatched"


# ---------------------------------------------------------------------------
# remap — the VRL program analog (palette.rs:127). Two surfaces:
#   options["source"]: a mini VRL program of `.target = <expr>` / `del(.f)`
#     statements (the observed reference usage, e.g.
#     dev/configs/production/vector.toml:24-39)
#   options["ops"]:    a declarative op list for the structured operations
#     (parse_regex / parse_kv / parse_json / set / cast / rename / drop)
# ---------------------------------------------------------------------------


def _split_statements(source: str) -> list[str]:
    """Split a remap program into statements on ``;``/newline at brace
    depth 0, so an ``if cond { ... } else { ... }`` block (which spans
    lines) stays one statement. Quote- and comment-aware: braces and
    separators inside ``"..."``/``'...'`` literals are text (so
    ``.x = "{"`` is a valid statement), and everything from an unquoted
    ``#`` to end-of-line is stripped before splitting."""
    stmts: list[str] = []
    cur: list[str] = []
    depth = 0
    quote = ""
    comment = False
    i, n = 0, len(source)
    while i < n:
        ch = source[i]
        if comment:
            if ch != "\n":
                i += 1
                continue
            comment = False  # the newline itself still splits below
        elif quote:
            cur.append(ch)
            if ch == "\\" and i + 1 < n:
                cur.append(source[i + 1])
                i += 2
                continue
            if ch == quote:
                quote = ""
            i += 1
            continue
        elif ch in "\"'":
            quote = ch
            cur.append(ch)
            i += 1
            continue
        elif ch == "#":
            comment = True
            i += 1
            continue
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth < 0:
                raise VrlError("unbalanced '}' in remap program")
        if ch in ";\n" and depth == 0:
            s = "".join(cur).strip()
            if s:
                stmts.append(s)
            cur = []
        else:
            cur.append(ch)
        i += 1
    if quote:
        raise VrlError("unterminated string literal in remap program")
    if depth != 0:
        raise VrlError("unbalanced '{' in remap program")
    s = "".join(cur).strip()
    if s:
        stmts.append(s)
    return stmts


def _find_brace(stmt: str, start: int) -> int:
    """Index of the first ``{`` at or after ``start`` that is not inside
    a string literal; -1 if none."""
    quote = ""
    i = start
    while i < len(stmt):
        ch = stmt[i]
        if quote:
            if ch == "\\":
                i += 1
            elif ch == quote:
                quote = ""
        elif ch in "\"'":
            quote = ch
        elif ch == "{":
            return i
        i += 1
    return -1


def _match_brace(stmt: str, open_idx: int) -> int:
    """Index of the ``}`` matching the ``{`` at ``open_idx``, skipping
    braces inside string literals."""
    depth = 0
    quote = ""
    i = open_idx
    while i < len(stmt):
        ch = stmt[i]
        if quote:
            if ch == "\\":
                i += 1
            elif ch == quote:
                quote = ""
        elif ch in "\"'":
            quote = ch
        elif ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise VrlError(f"unbalanced braces in {stmt!r}")


def _parse_if(stmt: str) -> dict:
    """Parse an ``if <cond> { ... } [else if <cond> { ... }]* [else
    { ... }]`` chain into ``{"op": "if", "branches": [(cond, ops)...],
    "else_ops": [...]}`` with recursively parsed branch bodies."""
    branches: list[tuple[str, list[dict]]] = []
    else_ops: list[dict] = []
    rest = stmt
    while True:
        m = re.match(r"^if\b\s*", rest)
        if not m:
            raise VrlError(f"malformed if statement: {stmt!r}")
        brace = _find_brace(rest, m.end())
        if brace < 0:
            raise VrlError(f"if condition missing '{{' block: {stmt!r}")
        cond = rest[m.end():brace].strip()
        if not cond:
            raise VrlError(f"empty if condition in {stmt!r}")
        close = _match_brace(rest, brace)
        branches.append((cond, _parse_program(rest[brace + 1 : close])))
        rest = rest[close + 1 :].strip()
        if not rest:
            break
        em = re.match(r"^else\b\s*", rest)
        if not em:
            raise VrlError(f"unexpected text after if block: {rest!r}")
        rest = rest[em.end():].strip()
        if rest.startswith("if"):
            continue  # else if — loop parses the next branch
        if not rest.startswith("{"):
            raise VrlError(f"malformed else block in {stmt!r}")
        close = _match_brace(rest, 0)
        else_ops = _parse_program(rest[1:close])
        tail = rest[close + 1 :].strip()
        if tail:
            raise VrlError(f"unexpected text after else block: {tail!r}")
        break
    return {"op": "if", "branches": branches, "else_ops": else_ops}


def _parse_program(source: str) -> list[dict]:
    ops: list[dict] = []
    for stmt in _split_statements(source):
        if stmt.startswith("#"):
            continue
        if re.match(r"^if\b", stmt):
            ops.append(_parse_if(stmt))
            continue
        m = re.match(r"^del\(\.([A-Za-z_][\w.]*)\)$", stmt)
        if m:
            ops.append({"op": "drop", "fields": [m.group(1)]})
            continue
        m = re.match(r"^\.([A-Za-z_][\w.]*)\s*=\s*(.+)$", stmt)
        if m:
            ops.append({"op": "set", "target": m.group(1), "expr": m.group(2)})
            continue
        raise VrlError(f"unsupported remap statement: {stmt!r}")
    return ops


def _set_column(table: pa.Table, name: str, values) -> pa.Table:
    if isinstance(values, pa.Scalar):  # arrow scalar (e.g. now()) → broadcast
        values = pa.array([values.as_py()] * table.num_rows, values.type)
    elif not hasattr(values, "type"):  # python scalar → broadcast
        values = pa.array([values] * table.num_rows)
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if name in table.column_names:
        return table.set_column(table.column_names.index(name), name, values)
    return table.append_column(name, values)


def _as_array(vals, num_rows: int):
    """Broadcast scalars to a combined Arrow array of ``num_rows``."""
    if isinstance(vals, pa.Scalar):
        vals = pa.array([vals.as_py()] * num_rows, vals.type)
    elif not hasattr(vals, "type"):
        vals = pa.array([vals] * num_rows)
    if isinstance(vals, pa.ChunkedArray):
        vals = vals.combine_chunks()
    return vals


def _masked_set(target: str, expr_fn) -> Callable:
    """One ``pc.if_else`` blend: rows under ``mask`` take the expression
    value (or null for a branch-local ``del``), the rest keep their
    current value."""

    def apply(t: pa.Table, mask) -> pa.Table:
        if expr_fn is None:  # del(.target) under a mask → set-to-null
            cur = (
                t[target].combine_chunks()
                if target in t.column_names
                else pa.nulls(t.num_rows)
            )
            vals = pa.nulls(t.num_rows, cur.type)
        else:
            vals = _as_array(expr_fn(t), t.num_rows)
            cur = (
                t[target].combine_chunks()
                if target in t.column_names
                else pa.nulls(t.num_rows, vals.type)
            )
            if pa.types.is_null(vals.type):
                vals = pa.nulls(t.num_rows, cur.type)
            elif cur.type != vals.type:
                cur = pc.cast(cur, vals.type)
        return _set_column(t, target, pc.if_else(mask, vals, cur))

    return apply


def _compile_masked_ops(ops: list[dict]) -> list[Callable]:
    out: list[Callable] = []
    for sub in ops:
        if sub["op"] == "set":
            out.append(_masked_set(sub["target"], compile_expr(sub["expr"])))
        elif sub["op"] == "drop":
            out.extend(_masked_set(f, None) for f in sub["fields"])
        elif sub["op"] == "if":
            out.append(_compile_if_masked(sub))
        else:
            raise VrlError(
                "only assignments, del() and nested if are supported "
                f"inside an if branch, got op {sub['op']!r}"
            )
    return out


def _compile_if_masked(op: dict) -> Callable:
    """Vectorized VRL ``if`` chain as a mask-threaded closure: each
    branch's condition claims the not-yet-claimed rows it matches
    (within the enclosing mask, so chains nest), and the branch's
    assignments are blended in with ``pc.if_else`` over that mask — one
    kernel pass per (branch, target), never a row loop. Branch bodies
    are assignments, ``del`` (a per-row conditional set-to-null — a
    columnar engine can't drop a column for a subset of rows) and
    nested ``if``s. Null condition results count as false (VRL's
    error-to-false condition semantics)."""
    branches: list[tuple[Any, list[Callable]]] = [
        (compile_predicate(cond), _compile_masked_ops(ops))
        for cond, ops in op["branches"]
    ]
    if op.get("else_ops"):
        branches.append((None, _compile_masked_ops(op["else_ops"])))

    def apply(t: pa.Table, outer) -> pa.Table:
        remaining = outer  # rows not claimed by an earlier branch
        for cond_fn, mops in branches:
            if cond_fn is None:  # else branch claims everything left
                mask = remaining
            else:
                mask = pc.fill_null(cond_fn(t), False)
                if isinstance(mask, pa.ChunkedArray):
                    mask = mask.combine_chunks()
                mask = pc.and_(mask, remaining)
            remaining = pc.and_(remaining, pc.invert(mask))
            for mop in mops:
                t = mop(t, mask)
        return t

    return apply


def _compile_if(op: dict) -> Callable[[pa.Table], pa.Table]:
    masked = _compile_if_masked(op)
    return lambda t: masked(t, pa.array(np.ones(t.num_rows, dtype=bool)))


def _compile_op(op: dict) -> Callable[[pa.Table], pa.Table]:
    kind = op["op"]

    if kind == "set":
        expr = compile_expr(op["expr"])
        target = op["target"]
        return lambda t: _set_column(t, target, expr(t))

    if kind == "if":
        return _compile_if(op)

    if kind == "parse_regex":
        # grok-style extraction: one compiled regex with named groups,
        # vectorized by pc.extract_regex over the whole column
        field, pattern = op["field"], op["pattern"]
        compiled = re.compile(pattern)
        names = list(compiled.groupindex)
        if not names:
            raise VrlError("parse_regex pattern needs named groups (?P<name>...)")
        types = op.get("types", {})

        def _apply(t: pa.Table) -> pa.Table:
            col = t[field]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            extracted = pc.extract_regex(col, pattern=pattern)
            for name in names:
                vals = pc.struct_field(extracted, name)
                want = types.get(name)
                if want == "int":
                    vals = pc.cast(vals, pa.int64())
                elif want == "float":
                    vals = pc.cast(vals, pa.float64())
                t = _set_column(t, name, vals)
            return t

        return _apply

    if kind == "parse_grok":
        # grok expression (%{PATTERN:field:type}) expanded once at
        # compile time into a named-group regex, then identical to
        # parse_regex: one vectorized extract_regex per batch
        from vector_ray.grok import grok_to_regex

        regex, grok_types = grok_to_regex(op["pattern"])
        merged = {**grok_types, **op.get("types", {})}
        return _compile_op(
            {
                "op": "parse_regex",
                "field": op["field"],
                "pattern": regex,
                "types": merged,
            }
        )

    if kind == "parse_url":
        # VRL parse_url(): decompose a URL column into scheme / host /
        # port / path / query / fragment columns — ONE vectorized
        # extract_regex per batch (RFC-3986-ish, same shape DuckDB
        # regexp_extract can reproduce for the oracle). Unparseable or
        # null rows yield all-null parts.
        field = op["field"]
        prefix = op.get("prefix", "url_")
        _URL_RE = (
            r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*)://"
            r"(?P<host>[^/:?#]*)(?::(?P<port>[0-9]+))?"
            r"(?P<path>/[^?#]*)?(?:\?(?P<query>[^#]*))?(?:#(?P<fragment>.*))?$"
        )

        def _apply(t: pa.Table) -> pa.Table:
            col = t[field]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            parts = pc.extract_regex(pc.cast(col, pa.string()), pattern=_URL_RE)
            for name in ("scheme", "host", "port", "path", "query", "fragment"):
                vals = pc.struct_field(parts, name)
                # optional groups match as empty strings; VRL yields null
                vals = pc.if_else(
                    pc.equal(vals, pa.scalar("", pa.string())),
                    pa.scalar(None, pa.string()),
                    vals,
                )
                t = _set_column(t, f"{prefix}{name}", vals)
            return t

        return _apply

    if kind == "parse_kv":
        # logfmt-ish `k=v` pairs: one extract_regex per requested key
        field = op["field"]
        keys = op["keys"]
        types = op.get("types", {})

        def _apply(t: pa.Table) -> pa.Table:
            col = t[field]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            for key in keys:
                pat = rf"(?:^|[ ,]){re.escape(key)}=(?P<v>[^\s,]+)"
                vals = pc.struct_field(pc.extract_regex(col, pattern=pat), "v")
                want = types.get(key)
                if want == "int":
                    vals = pc.cast(vals, pa.int64())
                elif want == "float":
                    vals = pc.cast(vals, pa.float64())
                t = _set_column(t, key, vals)
            return t

        return _apply

    if kind == "parse_query_string":
        # URL query strings: `a=1&b=two%20words` — per requested key one
        # vectorized regex extract, then the numpy percent-decoder
        # ('+' → space, invalid escapes stay literal)
        from vector_ray.vrl import _url_decode_array

        field = op["field"]
        keys = op["keys"]
        types = op.get("types", {})

        def _apply_qs(t: pa.Table) -> pa.Table:
            col = t[field]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            for key in keys:
                pat = rf"(?:^|[?&]){re.escape(key)}=(?P<v>[^&#]*)"
                vals = pc.struct_field(pc.extract_regex(col, pattern=pat), "v")
                vals = _url_decode_array(vals)
                want = types.get(key)
                if want == "int":
                    vals = pc.cast(vals, pa.int64())
                elif want == "float":
                    vals = pc.cast(vals, pa.float64())
                t = _set_column(t, key, vals)
            return t

        return _apply_qs

    if kind in ("parse_syslog", "parse_apache_common"):
        # fixed-format codecs (demo_logs formats syslog / apache_common,
        # ui config_panel.rs:794-806) — one vectorized extract_regex pass
        field = op["field"]
        if kind == "parse_syslog":
            # "<13>Feb  5 17:32:18 host-a app[123]: message body"
            pattern = (
                r"^(?:<(?P<priority>\d+)>)?"
                r"(?P<stamp>\w{3} +\d+ [\d:]+) "
                r"(?P<hostname>\S+) (?P<appname>[^\[\s:]+)"
                r"(?:\[(?P<procid>\d+)\])?: (?P<body>.*)$"
            )
            ints = {"priority", "procid"}
        else:
            # '1.2.3.4 - frank [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0" 200 2326'
            pattern = (
                r'^(?P<client>\S+) \S+ (?P<user>\S+) \[(?P<stamp>[^\]]+)\] '
                r'"(?P<method>\S+) (?P<path>\S+) (?P<protocol>[^"]+)" '
                r"(?P<status>\d+) (?P<size>\d+|-)"
            )
            ints = {"status", "size"}
        compiled = re.compile(pattern)
        names = list(compiled.groupindex)

        def _apply(t: pa.Table) -> pa.Table:
            col = t[field]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            extracted = pc.extract_regex(col, pattern=pattern)
            for name in names:
                vals = pc.struct_field(extracted, name)
                if name in ints:
                    ok = pc.match_substring_regex(vals, r"^\d+$")
                    vals = pc.if_else(
                        pc.fill_null(ok, False), vals, pa.scalar(None, pa.string())
                    )
                    vals = pc.cast(vals, pa.int64())
                t = _set_column(t, name, vals)
            return t

        return _apply

    if kind == "parse_gelf":
        # GELF codec (config_panel.rs:853-896 codec list): JSON payload
        # with fixed fields; short_message surfaces as `message`
        inner = _compile_op(
            {
                "op": "parse_json",
                "field": op["field"],
                "keys": op.get(
                    "keys",
                    ["version", "host", "short_message", "full_message",
                     "timestamp", "level"],
                ),
            }
        )

        def _gelf(t: pa.Table) -> pa.Table:
            t = inner(t)
            if "short_message" in t.column_names:
                t = _set_column(t, "message", t["short_message"])
                t = t.drop_columns(["short_message"])
            return t

        return _gelf

    if kind == "parse_logfmt":
        # logfmt == whitespace-separated k=v pairs; same machinery as
        # parse_kv with an explicit key list (Ray blocks need one schema)
        return _compile_op({**op, "op": "parse_kv"})

    if kind == "parse_native_json":
        # Vector's native_json codec (config_panel.rs:853-896): each
        # line is an event ENVELOPE — {"log": {...}} or {"metric":
        # {"name": ..., "tags": {...}, "counter": {"value": v} |
        # "gauge": {"value": v}}}. Unwrap: log keys become columns
        # (declared via keys/types like parse_json), metric rows get
        # metric_name / metric_kind / metric_value, and __kind says
        # which envelope each row carried.
        import json as _json

        field = op["field"]
        keys = op.get("keys", [])
        types = op.get("types", {})
        _t = {"int": pa.int64(), "float": pa.float64(), "string": pa.string(),
              "bool": pa.bool_()}
        bad = {k: v for k, v in types.items() if v not in _t}
        if bad:
            raise VrlError(
                f"parse_native_json types must be one of {sorted(_t)}; got {bad}"
            )

        def _native(t: pa.Table) -> pa.Table:
            col = pc.cast(t[field], pa.string())
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            kinds, names, mkinds, mvals = [], [], [], []
            logs: dict[str, list] = {k: [] for k in keys}
            for line in pc.fill_null(col, "{}").to_pylist():
                try:
                    env = _json.loads(line)
                except ValueError:
                    env = {}
                if isinstance(env, dict) and "metric" in env:
                    m = env["metric"] or {}
                    kinds.append("metric")
                    names.append(m.get("name"))
                    vk = "counter" if "counter" in m else (
                        "gauge" if "gauge" in m else None
                    )
                    mkinds.append(vk)
                    mvals.append((m.get(vk) or {}).get("value") if vk else None)
                    for k in keys:
                        logs[k].append(None)
                else:
                    log = (env or {}).get("log", {}) if isinstance(env, dict) else {}
                    kinds.append("log")
                    names.append(None)
                    mkinds.append(None)
                    mvals.append(None)
                    for k in keys:
                        logs[k].append(log.get(k) if isinstance(log, dict) else None)
            t = _set_column(t, "__kind", pa.array(kinds, pa.string()))
            t = _set_column(t, "metric_name", pa.array(names, pa.string()))
            t = _set_column(t, "metric_kind", pa.array(mkinds, pa.string()))
            t = _set_column(t, "metric_value", pa.array(mvals, pa.float64()))
            for k in keys:
                want = _t.get(types.get(k), None)
                vals = pa.array(logs[k], want) if want else pa.array(logs[k])
                t = _set_column(t, k, vals)
            return t

        return _native

    if kind == "parse_native":
        # Vector's `native` codec: protobuf wire-format event envelope
        # (config_panel.rs:853-896; event model messages.rs:124-183).
        # Runtime-built descriptor + upb C parse; see
        # stages/native_codec.py. Raises VrlError at compile time if no
        # protobuf runtime is available.
        from vector_ray.stages.native_codec import compile_parse_native

        return compile_parse_native(op)

    if kind == "parse_json":
        # `. = parse_json!(string!(.message))` analog (config.rs:412):
        # extract the requested keys from a JSON-string column. Uses a
        # per-batch pyarrow JSON reader — vectorized C++ parse, no
        # Python-per-row json.loads.
        import io

        from pyarrow import json as pa_json

        field = op["field"]
        keys = op.get("keys")
        # declared output types make the schema identical across blocks —
        # per-batch inference can otherwise drift (one block's ints, the
        # next block's strings) and fail Ray's schema unification
        types = op.get("types", {})
        _t = {"int": pa.int64(), "float": pa.float64(), "string": pa.string(),
              "bool": pa.bool_()}
        bad_types = {k: v for k, v in types.items() if v not in _t}
        if bad_types:
            # fail at compile time with a config error, not a per-batch
            # KeyError inside Ray workers
            raise VrlError(
                f"parse_json types must be one of {sorted(_t)}; got {bad_types}"
            )

        def _coerce(vals, want: pa.DataType):
            """Cast with null-on-failure semantics (fallible VRL cast)."""
            try:
                return pc.cast(vals, want)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                pass
            py = {
                pa.int64(): int, pa.float64(): float, pa.bool_(): bool,
                pa.string(): str,
            }[want]
            out = []
            for v in pc.cast(vals, pa.string()).to_pylist():
                try:
                    out.append(py(v) if v is not None else None)
                except (ValueError, TypeError):
                    out.append(None)
            return pa.array(out, want)

        def _parse_lines(lines: list[str]) -> pa.Table:
            buf = io.BytesIO(("\n".join(lines) + "\n").encode())
            return pa_json.read_json(buf)

        def _rowwise(lines: list[str]) -> pa.Table:
            # last-resort per-row parse: handles malformed rows AND
            # valid-but-type-heterogeneous values (e.g. {"k":1} then
            # {"k":"x"}, which the vectorized reader rejects). Values
            # whose type conflicts with the column majority become null;
            # fully conflicting columns fall back to strings.
            import json as _json

            objs = []
            for line in lines:
                try:
                    obj = _json.loads(line)
                    objs.append(obj if isinstance(obj, dict) else {})
                except ValueError:
                    objs.append({})
            names = keys if keys is not None else sorted(
                {k for o in objs for k in o}
            )
            cols = {}
            for name in names:
                vals = [o.get(name) for o in objs]
                try:
                    cols[name] = pa.array(vals)
                except (pa.ArrowInvalid, pa.ArrowTypeError):
                    cols[name] = pa.array(
                        [None if v is None else str(v) for v in vals],
                        pa.string(),
                    )
            # an all-malformed block with no declared keys contributes no
            # columns — never leak a placeholder into the user schema
            return pa.table(cols) if cols else None

        def _apply(t: pa.Table) -> pa.Table:
            col = pc.cast(t[field], pa.string())
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            lines = pc.fill_null(col, "{}").to_pylist()
            try:
                parsed = _parse_lines(lines)
            except pa.ArrowInvalid:
                # dirty batch: fall back to per-row parsing — the slow
                # path runs only when the vectorized C++ parse fails
                parsed = _rowwise(lines)
            parsed_names = parsed.column_names if parsed is not None else []
            use = keys if keys is not None else parsed_names
            for key in use:
                if key in parsed_names:
                    vals = parsed[key]
                    if key in types:
                        vals = _coerce(vals, _t[types[key]])
                    t = _set_column(t, key, vals)
                else:
                    typ = _t[types[key]] if key in types else pa.null()
                    t = _set_column(t, key, pa.nulls(t.num_rows, typ))
            return t

        return _apply

    if kind == "cast":
        field = op["field"]
        typ = {"int": pa.int64(), "int32": pa.int32(), "float": pa.float64(),
               "string": pa.string(), "bool": pa.bool_()}[op["type"]]
        return lambda t: _set_column(t, field, pc.cast(t[field], typ))

    if kind == "rename":
        mapping = op["mapping"]
        return lambda t: t.rename_columns(
            [mapping.get(c, c) for c in t.column_names]
        )

    if kind == "drop":
        fields = op["fields"]
        return lambda t: t.drop_columns([f for f in fields if f in t.column_names])

    raise VrlError(f"unknown remap op {kind!r}")


def compile_remap(options: dict) -> Callable[[pa.Table], pa.Table]:
    ops = list(options.get("ops") or [])
    if options.get("source"):
        ops = _parse_program(options["source"]) + ops
    compiled = [_compile_op(op) for op in ops]

    def _remap(t: pa.Table) -> pa.Table:
        for fn in compiled:
            t = fn(t)
        return t

    return _remap


def remap(ds, options: dict, ctx=None):
    return ds.map_batches(compile_remap(options), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# filter (palette.rs:131, config_panel.rs:1449-1614)
# ---------------------------------------------------------------------------


def compile_condition(cond, condition_type: str = "vrl"):
    """Compile a condition of any supported syntax to a mask function —
    the reference's condition_type dispatch (config_panel.rs:1461-1467):
    vrl (default) | datadog_search | is_log | is_metric | is_trace."""
    import numpy as np

    if callable(cond):
        return cond
    if condition_type == "vrl":
        return compile_predicate(cond)
    if condition_type == "datadog_search":
        from vector_ray.datadog import compile_datadog

        return compile_datadog(cond)
    if condition_type in ("is_log", "is_metric", "is_trace"):
        # our Arrow mapping: metric rows carry the MetricEvent columns
        # (name/kind/value, shared/src/messages.rs:145-171); logs don't;
        # traces are not modeled.
        def type_mask(t: pa.Table):
            is_metric = {"name", "kind", "value"} <= set(t.column_names)
            keep = (
                is_metric
                if condition_type == "is_metric"
                else (not is_metric if condition_type == "is_log" else False)
            )
            return pa.array(np.full(t.num_rows, keep))

        return type_mask
    raise VrlError(f"unsupported condition syntax {condition_type!r}")


def compile_filter(options: dict) -> Callable[[pa.Table], pa.Table]:
    mask = compile_condition(
        options["condition"], options.get("condition_type", "vrl")
    )
    return lambda t: t.filter(mask(t))


def filter_(ds, options: dict, ctx=None):
    return ds.map_batches(compile_filter(options), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# route (palette.rs:132, config_panel.rs:1643-1667): label once with a
# __route column; named outputs = filtered views / partitioned writes.
#
# DIVERGENCE from upstream Vector: Vector's route delivers an event to
# EVERY output whose condition matches; our default mode="exclusive" is
# first-match-wins (each row gets exactly ONE label), which is what makes
# the single-pass partitioned sink write and the per-sink aggregate
# counts well-defined. Pipelines ported from Vector configs that rely on
# multi-output delivery should pass mode="all": one labeled COPY of the
# row is emitted per matching route (rows matching nothing get one
# "_unmatched" copy), at the cost of output duplication.
# ---------------------------------------------------------------------------


def compile_route_label(options: dict) -> Callable[[pa.Table], pa.Table]:
    routes = options["route"]
    mode = options.get("mode", "exclusive")
    if mode not in ("exclusive", "all"):
        raise VrlError(f"route mode must be 'exclusive' or 'all', got {mode!r}")
    compiled = [(name, compile_predicate(cond)) for name, cond in routes.items()]

    def _label_exclusive(t: pa.Table) -> pa.Table:
        label = np.full(t.num_rows, UNMATCHED, dtype=object)
        assigned = np.zeros(t.num_rows, dtype=bool)
        for name, mask_fn in compiled:
            m = mask_fn(t)
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            hit = np.asarray(m.to_numpy(zero_copy_only=False)) & ~assigned
            label[hit] = name
            assigned |= hit
        return _set_column(t, ROUTE_COLUMN, pa.array(label, pa.string()))

    def _label_all(t: pa.Table) -> pa.Table:
        # one labeled copy per matching route (upstream Vector semantics)
        parts = []
        matched = np.zeros(t.num_rows, dtype=bool)
        for name, mask_fn in compiled:
            m = mask_fn(t)
            if isinstance(m, pa.ChunkedArray):
                m = m.combine_chunks()
            hit = np.asarray(m.to_numpy(zero_copy_only=False))
            matched |= hit
            sub = t.filter(pa.array(hit))
            parts.append(
                _set_column(sub, ROUTE_COLUMN, pa.array([name] * sub.num_rows, pa.string()))
            )
        rest = t.filter(pa.array(~matched))
        parts.append(
            _set_column(
                rest, ROUTE_COLUMN, pa.array([UNMATCHED] * rest.num_rows, pa.string())
            )
        )
        return pa.concat_tables([p for p in parts])

    return _label_all if mode == "all" else _label_exclusive


def route(ds, options: dict, ctx=None):
    """Returns the labeled dataset; the pipeline compiler exposes the named
    output ports as `__route == name` filters (Connection.from_port analog,
    shared/src/config.rs:224-231)."""
    return ds.map_batches(compile_route_label(options), batch_format="pyarrow")


def route_port(ds, port: str):
    return ds.map_batches(
        lambda t: t.filter(pc.equal(t[ROUTE_COLUMN], port)),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# sample (palette.rs:133): keep 1 in `rate`. Deterministic — hash of
# key_field modulo rate (reproducible across runs/cluster sizes, unlike
# random sampling; SURVEY.md §2.1 #4). With an integer key the modulo is
# taken directly so a SQL oracle can reproduce it.
# ---------------------------------------------------------------------------


def _stable_hash_u64(col: pa.ChunkedArray) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of a string/binary column
    (FNV-1a over bytes via numpy, stable across processes)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.cast(col, pa.large_binary())
    flat = col.buffers()[2]
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset : col.offset + len(col) + 1
    ]
    data = np.frombuffer(flat, dtype=np.uint8)
    out = np.full(len(col), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    lengths = np.diff(offsets)
    maxlen = int(lengths.max()) if len(lengths) else 0
    for i in range(maxlen):
        active = lengths > i
        byte = data[offsets[:-1][active] + i].astype(np.uint64)
        out[active] = (out[active] ^ byte) * prime
    return out


def compile_sample(options: dict) -> Callable[[pa.Table], pa.Table]:
    rate = int(options.get("rate", 10))
    offset = int(options.get("offset", 0))
    key = options.get("key_field")

    def _sample(t: pa.Table) -> pa.Table:
        if key is None:
            raise VrlError("sample requires key_field for determinism")
        col = t[key]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_integer(col.type):
            vals = col.to_numpy(zero_copy_only=False)
            return t.filter(pa.array((vals % rate) == offset))
        h = _stable_hash_u64(col)
        return t.filter(pa.array((h % np.uint64(rate)) == np.uint64(offset)))

    return _sample


def sample(ds, options: dict, ctx=None):
    return ds.map_batches(compile_sample(options), batch_format="pyarrow")


def identity(ds, options: dict, ctx=None):
    """test_basic (palette.rs:149) — no-op."""
    return ds


def assert_schema(ds, options: dict, ctx=None):
    """Data-contract enforcement — the schema/constraint gate a 100 TB
    ingest runs before anything expensive:

    {"type": "assert_schema",
     "columns": {"value":      {"not_null": true, "min": 0, "max": 1e9},
                 "event_type": {"in": ["click", "view", "purchase"]},
                 "doc_id":     {"regex": "^doc-"}},
     "on_violation": "drop" | "label" | "error"}

    Constraints per column: not_null, min / max (inclusive), in
    (value set), regex (RE2 FULL match on the string cast — anchored
    both ends; use ``.*`` for prefix semantics). All checks compile to
    one vectorized boolean mask per batch. NULL handling: a null value
    passes min/max/in/regex checks unless ``not_null`` is also set —
    so the ``drop`` mode mirrors SQL WHERE exactly only when nullable
    columns carry ``not_null`` (SQL drops NULL comparisons; a bare
    range check here keeps them). Modes: ``drop`` (default) filters
    violating rows; ``label`` keeps every row and appends a
    ``__valid`` bool column; ``error`` raises on the first violating
    batch with a per-column violation count — fail-fast ingestion."""
    columns = options.get("columns") or {}
    mode = options.get("on_violation", "drop")
    if mode not in ("drop", "label", "error"):
        raise VrlError(
            f"assert_schema: on_violation must be drop|label|error, got {mode!r}"
        )

    def _col_mask(t: pa.Table, name: str, spec: dict):
        if name not in t.column_names:
            raise VrlError(f"assert_schema: column {name!r} missing from input")
        col = t[name]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        mask = None

        def _and(m):
            nonlocal mask
            mask = m if mask is None else pc.and_kleene(mask, m)

        if spec.get("not_null"):
            _and(pc.is_valid(col))
        if "min" in spec:
            _and(pc.greater_equal(col, pa.scalar(spec["min"])))
        if "max" in spec:
            _and(pc.less_equal(col, pa.scalar(spec["max"])))
        if "in" in spec:
            _and(pc.is_in(col, value_set=pa.array(list(spec["in"]))))
        if "regex" in spec:
            _and(
                pc.match_substring_regex(
                    pc.cast(col, pa.string()), f"^(?:{spec['regex']})$"
                )
            )
        if mask is None:
            return pa.array([True] * t.num_rows, pa.bool_())
        # null comparisons are null under Kleene logic; a null check
        # result means the constraint is NOT satisfied unless the only
        # reason is an allowed null (no not_null constraint): treat
        # null-valued rows as passing range/set checks when nulls are
        # allowed, violating when not_null is set (already false above).
        if not spec.get("not_null"):
            mask = pc.or_kleene(mask, pc.is_null(col))
        return pc.fill_null(mask, False)

    def check(t: pa.Table) -> pa.Table:
        valid = pa.array([True] * t.num_rows, pa.bool_())
        per_col_bad: dict[str, int] = {}
        for name, spec in columns.items():
            m = _col_mask(t, name, spec)
            if mode == "error":
                bad = t.num_rows - pc.sum(pc.cast(m, pa.int64())).as_py()
                if bad:
                    per_col_bad[name] = bad
            valid = pc.and_(valid, m)
        if mode == "error" and per_col_bad:
            raise ValueError(
                f"assert_schema: contract violations {per_col_bad}"
            )
        if mode == "label":
            return t.append_column(
                "__valid", valid.combine_chunks() if isinstance(valid, pa.ChunkedArray) else valid
            )
        return t.filter(valid)

    return ds.map_batches(check, batch_format="pyarrow")
