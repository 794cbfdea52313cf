"""Datadog-search condition syntax (the reference's alternate filter
condition type, ui config_panel.rs:1461-1467 & examples 1584-1599).

Supported subset, compiled to vectorized pyarrow masks:

    service:web                  field equality
    service:web*                 prefix wildcard (also *web, *eb*)
    status:(error OR warn)       value groups
    status:>=400  status:>399    numeric comparisons
    -service:web / NOT service:web   negation
    a AND b / a OR b / a b       boolean ops (adjacency = AND)
    "exact phrase"               bare terms match against `message`
"""

from __future__ import annotations

import re
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from vector_ray.vrl import VrlError

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<lpar>\()
  | (?P<rpar>\))
  | (?P<op>AND\b|OR\b|NOT\b)
  | (?P<neg>-)
  | (?P<quoted>"(?:[^"\\]|\\.)*")
  | (?P<term>[^\s()"]+)
    """,
    re.X,
)


def _tokenize(src: str):
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m:
            raise VrlError(f"bad datadog-search token at {pos} in {src!r}")
        pos = m.end()
        if m.lastgroup != "ws":
            out.append((m.lastgroup, m.group()))
    out.append(("eof", ""))
    return out


Mask = Callable[[pa.Table], pa.ChunkedArray]


def _col(t: pa.Table, name: str):
    if name in t.column_names:
        return t[name]
    return pa.nulls(t.num_rows)


def _false(t: pa.Table):
    import numpy as np

    return pa.array(np.zeros(t.num_rows, dtype=bool))


_NUM_RE = re.compile(r"^(>=|<=|>|<)(-?\d+(?:\.\d+)?)$")


def _value_mask(field: str, value: str) -> Mask:
    m = _NUM_RE.match(value)
    if m:
        op, num = m.group(1), float(m.group(2))
        fn = {">": pc.greater, ">=": pc.greater_equal,
              "<": pc.less, "<=": pc.less_equal}[op]

        def numeric(t: pa.Table):
            col = _col(t, field)
            try:
                col = pc.cast(col, pa.float64())
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                return _false(t)
            return pc.fill_null(fn(col, num), False)

        return numeric

    if value.startswith('"') and value.endswith('"'):
        value = re.sub(r"\\(.)", r"\1", value[1:-1])

    has_pre = value.startswith("*")
    has_suf = value.endswith("*")
    core = value.strip("*")

    def match(t: pa.Table):
        col = _col(t, field)
        try:
            col = pc.cast(col, pa.string())
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return _false(t)
        if has_pre and has_suf:
            m_ = pc.match_substring(col, core)
        elif has_suf:
            m_ = pc.starts_with(col, core)
        elif has_pre:
            m_ = pc.ends_with(col, core)
        else:
            m_ = pc.equal(col, value)
        return pc.fill_null(m_, False)

    return match


class _Parser:
    def __init__(self, src: str, default_field: str = "message"):
        self.src = src
        self.toks = _tokenize(src)
        self.i = 0
        self.default_field = default_field

    def peek(self):
        return self.toks[self.i]

    def next(self):
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def parse(self) -> Mask:
        e = self.or_()
        if self.peek()[0] != "eof":
            raise VrlError(f"trailing input {self.peek()[1]!r} in {self.src!r}")
        return e

    def or_(self) -> Mask:
        left = self.and_()
        while self.peek()[1] == "OR":
            self.next()
            right = self.and_()
            l, r = left, right
            left = lambda t, l=l, r=r: pc.or_(l(t), r(t))
        return left

    def and_(self) -> Mask:
        left = self.not_()
        while True:
            kind, val = self.peek()
            if val == "AND":
                self.next()
            elif kind in ("term", "quoted", "neg", "lpar") or val == "NOT":
                pass  # implicit AND on adjacency
            else:
                return left
            right = self.not_()
            l, r = left, right
            left = lambda t, l=l, r=r: pc.and_(l(t), r(t))

    def not_(self) -> Mask:
        kind, val = self.peek()
        if val == "NOT" or kind == "neg":
            self.next()
            inner = self.not_()
            return lambda t: pc.invert(inner(t))
        return self.primary()

    def primary(self) -> Mask:
        kind, val = self.next()
        if kind == "lpar":
            e = self.or_()
            if self.next()[0] != "rpar":
                raise VrlError(f"missing ) in {self.src!r}")
            return e
        if kind == "quoted":
            phrase = re.sub(r"\\(.)", r"\1", val[1:-1])
            field = self.default_field
            return lambda t: pc.fill_null(
                pc.match_substring(pc.cast(_col(t, field), pa.string()), phrase),
                False,
            )
        if kind == "term":
            if val.endswith(":") and self.peek()[0] == "quoted":
                # quoted field value: service:"web server"
                field = val[:-1]
                return _value_mask(field, self.next()[1])
            if val.endswith(":") and self.peek()[0] == "lpar":
                # field:(a OR b) value group
                field = val[:-1]
                self.next()
                masks = [self._group_value(field)]
                while self.peek()[1] == "OR":
                    self.next()
                    masks.append(self._group_value(field))
                if self.next()[0] != "rpar":
                    raise VrlError(f"missing ) in value group in {self.src!r}")

                def any_of(t: pa.Table, masks=masks):
                    out = masks[0](t)
                    for m_ in masks[1:]:
                        out = pc.or_(out, m_(t))
                    return out

                return any_of
            if ":" in val:
                field, _, value = val.partition(":")
                return _value_mask(field, value)
            # bare term searches the default field
            field = self.default_field
            return lambda t, v=val: pc.fill_null(
                pc.match_substring(pc.cast(_col(t, field), pa.string()), v),
                False,
            )
        raise VrlError(f"unexpected {val!r} in {self.src!r}")

    def _group_value(self, field: str) -> Mask:
        kind, val = self.next()
        if kind == "quoted":
            val = val  # keep quotes for _value_mask
        elif kind != "term":
            raise VrlError(f"bad value group member {val!r} in {self.src!r}")
        return _value_mask(field, val)


def compile_datadog(src: str, default_field: str = "message") -> Mask:
    """Compile a datadog-search query into ``fn(table) -> bool mask``."""
    return _Parser(src, default_field).parse()
