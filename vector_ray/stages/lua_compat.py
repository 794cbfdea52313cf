"""Vector ``lua`` transform compatibility shim (reference palette:
ui/src/components/pipeline/palette.rs:128 models the transform; Vector's
public lua v2 docs define the config surface: ``version``, ``source``
global setup, ``hooks.process = "function (event, emit) ... end"``).

This engine has no Lua VM. Instead, the TRIVIALLY MAPPABLE statement
subset of a verbatim Vector lua v2 config is translated to the engine's
vectorized VRL remap program:

    event.log.<field> = <expr>        ->  .<field> = <expr'>
    event.log.<field> = nil           ->  del(.<field>)
    if <cond> then <stmts>
    [elseif <cond> then <stmts>]*
    [else <stmts>] end                ->  if <cond'> { ... } else ...
    emit(event)  (exactly once, last)   -> (implicit: remap emits 1:1)

where <expr'> maps ``event.log.x`` -> ``.x``, Lua's ``..`` concat ->
VRL ``+`` (STRING operands only — Lua ``..`` coerces numbers to
strings, ``1 .. 2 == "12"``, which VRL ``+`` would compute as 3, so a
``..`` with a numeric-literal operand or mixed un-parenthesized
``..``/arithmetic raises instead of silently diverging), and passes
through numeric/string literals, ``+ - * / %``, comparisons
(``== ~= < > <= >=``), ``and/or/not``, ``nil`` and parentheses.
Conditional blocks nest; a branch body is assignments / nil-deletes /
nested ifs. The common string-library calls map to their vectorized
VRL equivalents (round-4): ``string.upper``/``lower`` -> upcase/
downcase, ``string.len`` -> length, ``string.sub(s, i, j)`` -> slice
with the 1-based-inclusive -> 0-based-exclusive shift (positive
ascending literal indices only), ``tostring`` -> string, ``tonumber``
-> to_float (nil-on-failure == VRL null).

Round-5 additions — still no VM, still translate-time only:

    local x = <expr>                  -> straight-line substitution: later
                                         references to ``x`` inline the
                                         translated expression. A local
                                         whose referenced event fields are
                                         REASSIGNED after its definition
                                         is tainted — using it then raises
                                         (substitution would read the new
                                         value where Lua kept the old one).
    x = <expr>   (x a known local)    -> rebinds the substitution text
                                         (accumulator patterns unroll to
                                         nested expressions)
    for i = A, B [, S] do ... end     -> literal integer bounds unroll at
                                         translate time (≤ 64 iterations
                                         per loop, ≤ 256 total); the loop
                                         variable is a local bound to each
                                         literal value in turn

Locals and loops are top-level (or loop-body) constructs; inside an
``if`` branch they raise (a conditionally-executed binding has no
straight-line substitution). Anything outside the subset — ``while`` /
``repeat`` loops, non-literal loop bounds, other library calls,
stateful global setup, conditional emit / drop — raises ``VrlError``
naming the construct, so a user porting a real lua block sees exactly
which line needs a rewrite (to filter / route / pyscript) instead of
silently wrong output.
"""

from __future__ import annotations

import re

from vector_ray.vrl import VrlError

_HOOK_RE = re.compile(
    r"^\s*function\s*\(\s*([A-Za-z_]\w*)\s*,\s*([A-Za-z_]\w*)\s*\)"
    r"(.*)\bend\s*$",
    re.S,
)

_ARITH_OPS = set("+-*/%")


def _field_pattern(ev: str) -> re.Pattern:
    return re.compile(
        rf"{re.escape(ev)}\.log(?:\.(?P<dot>[A-Za-z_]\w*)"
        rf"|\[\s*(?P<q>[\"'])(?P<br>[A-Za-z_]\w*)(?P=q)\s*\])"
    )


# Lua standard-library calls with a direct vectorized VRL equivalent.
# string.sub is handled separately (its 1-based inclusive indices shift
# at translate time). Values: (VRL name, returns-string?).
_LUA_FUNCS = {
    "string.upper": ("upcase", True),
    "string.lower": ("downcase", True),
    "string.len": ("length", False),
    "tostring": ("string", True),
    "tonumber": ("to_float", False),  # nil on failure == VRL null
}

_SUB_RE = re.compile(
    r"string\.sub\s*\(\s*(?P<inner>.*?)\s*,\s*(?P<i>-?\d+)\s*,"
    r"\s*(?P<j>-?\d+)\s*\)"
)
_FUNC_RE = re.compile(
    r"(?P<name>string\.(?:upper|lower|len)|tostring|tonumber)(?=\s*\()"
)


_IDENT_RE = re.compile(r"[A-Za-z_]\w*")


def _tokenize(
    expr: str, ev: str, conditions: bool, scope: dict | None = None,
    fields_out: set | None = None,
) -> list[tuple[str, str]]:
    """Lua expression -> [(kind, VRL text)] tokens. ``conditions``
    additionally admits comparison / boolean operators and ``nil``.
    ``scope`` maps local-variable names to their substitution records;
    ``fields_out`` collects the event fields the expression reads
    (directly or through a substituted local) for taint tracking."""
    field_re = _field_pattern(ev)
    tok_re = re.compile(
        r"\s*(?:(?P<concat>\.\.)"
        r"|(?P<cmp>[=~<>]=|<|>)"
        r"|(?P<word>\b(?:and|or|not|nil|true|false)\b)"
        r"|(?P<op>[-+*/%()])"
        r"|(?P<num>\d+(?:\.\d+)?)"
        r"|(?P<dq>\"[^\"]*\")|(?P<sq>'[^']*'))"
    )
    _WORDS = {
        "and": "&&", "or": "||", "not": "!", "nil": "null",
        "true": "true", "false": "false",
    }
    _CMPS = {"==": "==", "~=": "!=", "<=": "<=", ">=": ">=", "<": "<", ">": ">"}
    toks: list[tuple[str, str]] = []
    pos, n = 0, len(expr)
    while pos < n:
        if expr[pos].isspace():
            pos += 1
            continue
        m = field_re.match(expr, pos)
        if m:
            name = m.group("dot") or m.group("br")
            if fields_out is not None:
                fields_out.add(name)
            toks.append(("field", "." + name))
            pos = m.end()
            continue
        m = _SUB_RE.match(expr, pos)
        if m:
            # Lua string.sub(s, i, j): 1-based INCLUSIVE; VRL slice is
            # 0-based exclusive -> slice(s, i-1, j). Negative (from-end)
            # indices have no literal VRL spelling — raise by name.
            i, j = int(m.group("i")), int(m.group("j"))
            if i < 1 or j < i:
                raise VrlError(
                    f"lua: string.sub indices ({i}, {j}) are not "
                    "translatable (only positive ascending 1-based "
                    "literals map to VRL slice)"
                )
            inner = _translate_expr(
                m.group("inner"), ev, scope=scope, fields_out=fields_out
            )
            toks.append(("strcall", f"slice({inner}, {i - 1}, {j})"))
            pos = m.end()
            continue
        m = _FUNC_RE.match(expr, pos)
        if m:
            vrl_name, returns_str = _LUA_FUNCS[m.group("name")]
            toks.append(("func_str" if returns_str else "func", vrl_name))
            pos = m.end()
            continue
        m = tok_re.match(expr, pos)
        if m and m.end() > pos:
            if m.group("concat"):
                toks.append(("concat", "+"))
            elif m.group("cmp"):
                if not conditions:
                    raise VrlError(
                        f"lua: comparison {m.group('cmp')!r} outside an "
                        f"if condition in {expr.strip()!r}"
                    )
                if m.group("cmp") == "=":
                    raise VrlError(
                        f"lua: bare '=' in condition {expr.strip()!r} "
                        "(did you mean '=='?)"
                    )
                toks.append(("cmp", _CMPS[m.group("cmp")]))
            elif m.group("word"):
                w = m.group("word")
                if w in ("and", "or", "not") and not conditions:
                    raise VrlError(
                        f"lua: boolean {w!r} outside an if condition in "
                        f"{expr.strip()!r}"
                    )
                toks.append(("word", _WORDS[w]))
            elif m.group("op"):
                toks.append(("op", m.group("op")))
            elif m.group("num"):
                toks.append(("num", m.group("num")))
            elif m.group("dq"):
                toks.append(("str", m.group("dq")))
            else:  # single-quoted lua string -> double-quoted VRL
                inner = m.group("sq")[1:-1]
                if '"' in inner:
                    raise VrlError(
                        "lua: embedded double quote in single-quoted "
                        f"string literal {m.group('sq')!r} is not "
                        "translatable"
                    )
                toks.append(("str", f'"{inner}"'))
            pos = m.end()
            continue
        m = _IDENT_RE.match(expr, pos)
        if m and scope is not None and m.group(0) in scope:
            var = scope[m.group(0)]
            if var["tainted"]:
                raise VrlError(
                    f"lua: local {m.group(0)!r} reads event field(s) "
                    f"{sorted(var['fields'])} that were reassigned after "
                    "its definition — straight-line substitution would "
                    "use the NEW value where Lua keeps the old one; "
                    "move the local below the reassignment or inline it"
                )
            toks.append(("local", f"({var['expr']})"))
            if fields_out is not None:
                fields_out |= var["fields"]
            pos = m.end()
            continue
        bad = expr[pos:].split()[0]
        raise VrlError(
            f"lua: unsupported construct {bad!r} in expression "
            f"{expr.strip()!r} (translatable subset: event.log fields, "
            "local variables, numeric/string/boolean literals, "
            "+ - * / % .. comparisons, and/or/not, nil and parentheses)"
        )
    if not toks:
        raise VrlError(f"lua: empty expression in {expr!r}")
    return toks


def _check_concat(toks: list[tuple[str, str]], expr: str) -> None:
    """Reject the ``..`` spellings whose Lua value diverges from VRL
    ``+``: Lua coerces numeric operands to strings (``1 .. 2`` is
    "12"; VRL ``+`` gives 3) and binds ``..`` LOOSER than arithmetic
    (``a .. b + c`` is ``a .. (b+c)``), so a numeric-literal operand or
    a ``..`` mixed with un-parenthesized arithmetic in the same
    parenthesis group raises instead of silently producing a different
    value. String-only concat chains translate fine."""
    # which ')' tokens close a STRING-RETURNING call (tostring/upcase/
    # ...) — those are safe '..' operands; a bare parenthesized
    # subexpression is not (its value could be numeric)
    str_close: set[int] = set()
    stack_prev: list[tuple[int, str]] = []
    for idx, (kind, text) in enumerate(toks):
        if kind == "op" and text == "(":
            stack_prev.append((idx, toks[idx - 1][0] if idx else ""))
        elif kind == "op" and text == ")" and stack_prev:
            _, prev_kind = stack_prev.pop()
            if prev_kind == "func_str":
                str_close.add(idx)
    for i, (kind, _) in enumerate(toks):
        if kind != "concat":
            continue
        for j in (i - 1, i + 1):
            if not 0 <= j < len(toks):
                continue
            if toks[j][0] == "num":
                raise VrlError(
                    "lua: '..' with a numeric operand coerces to string "
                    f"in Lua ('1 .. 2' == \"12\") in {expr.strip()!r} — "
                    "not translatable to VRL '+'; wrap the operand in "
                    "quotes if string concat is intended"
                )
            if toks[j][0] == "local" or (
                toks[j][0] == "op"
                and (
                    toks[j][1] == "("
                    or (toks[j][1] == ")" and j not in str_close)
                )
            ):
                raise VrlError(
                    "lua: '..' on a parenthesized subexpression or "
                    f"local variable in {expr.strip()!r} could be a "
                    "numeric value Lua would coerce to string — not "
                    "translatable; concatenate fields/literals directly "
                    "(or wrap in tostring())"
                )
            if toks[j][0] == "field":
                # Lua '..' coerces the operand to string; make that
                # explicit so two NUMERIC fields concatenate ("12")
                # instead of silently adding (int fields match Lua
                # exactly; float formatting may differ from Lua %.14g)
                toks[j] = ("fieldstr", f"string({toks[j][1]})")
    # per parenthesis group: '..' and arithmetic may not mix (their
    # relative precedence differs between Lua and VRL)
    stack: list[set] = [set()]
    for kind, text in toks:
        if kind == "op" and text == "(":
            stack.append(set())
        elif kind == "op" and text == ")":
            if len(stack) > 1:
                stack.pop()
        elif kind == "concat":
            stack[-1].add("concat")
        elif kind == "op" and text in _ARITH_OPS:
            stack[-1].add("arith")
        for grp in stack[-1:]:
            if len(grp) > 1:
                raise VrlError(
                    "lua: mixing '..' and arithmetic without explicit "
                    f"parentheses in {expr.strip()!r} is ambiguous "
                    "(Lua binds '..' looser than '+'); parenthesize the "
                    "arithmetic"
                )


def _translate_expr(
    expr: str, ev: str, conditions: bool = False,
    scope: dict | None = None, fields_out: set | None = None,
) -> str:
    toks = _tokenize(expr, ev, conditions, scope, fields_out)
    _check_concat(toks, expr)
    return " ".join(t for _, t in toks)


_IF_RE = re.compile(r"^if\b(?P<cond>.+?)\bthen$")
_ELSEIF_RE = re.compile(r"^elseif\b(?P<cond>.+?)\bthen$")
_LOCAL_RE = re.compile(r"^local\s+(?P<name>[A-Za-z_]\w*)\s*=\s*(?P<rhs>.+)$")
_FOR_RE = re.compile(
    r"^for\s+(?P<var>[A-Za-z_]\w*)\s*=\s*(?P<a>-?\d+)\s*,\s*(?P<b>-?\d+)"
    r"(?:\s*,\s*(?P<s>-?\d+))?\s+do$"
)
_BLOCK_OPEN_RE = re.compile(r"^(?:if|for|while)\b.*\b(?:then|do)$")

# unroll bounds: per-loop and total across nested loops — past these a
# translate-time unroll stops being "a few vectorized statements" and
# the config needs a real rewrite (pyscript), not a 10k-statement remap
_MAX_UNROLL = 64
_MAX_UNROLL_TOTAL = 256


def _taint(scope: dict | None, field_name: str) -> None:
    """Mark every live local that reads ``field_name`` as tainted —
    substitution after the field changes would diverge from Lua."""
    if scope:
        for var in scope.values():
            if field_name in var["fields"]:
                var["tainted"] = True


def _collect_for_body(lines: list[str], i: int) -> tuple[list[str], int]:
    """Body lines of the ``for ... do`` at ``lines[i]`` up to its
    matching ``end``; returns (body, index after the end)."""
    depth_ctr = 1
    j = i + 1
    body: list[str] = []
    while j < len(lines):
        ln = lines[j]
        if _BLOCK_OPEN_RE.match(ln):
            depth_ctr += 1
        elif ln == "end":
            depth_ctr -= 1
            if depth_ctr == 0:
                return body, j + 1
        body.append(ln)
        j += 1
    raise VrlError("lua: 'for' block not closed with 'end'")


def _parse_block(
    lines: list[str], i: int, ev: str, depth: int,
    scope: dict | None = None, allow_locals: bool = False,
    budget: list | None = None,
) -> tuple[list[str], int]:
    """Parse statements from ``lines[i:]`` until the terminator of the
    current block (``end`` / ``elseif`` / ``else`` at this depth);
    returns (VRL statements, index of the terminator line). ``scope``
    holds local-variable substitutions (readable at any depth;
    declarations/reassignments and ``for`` loops only where
    ``allow_locals`` — top level and unrolled loop bodies, where
    execution is unconditional)."""
    stmts: list[str] = []
    field_re = _field_pattern(ev)
    if budget is None:
        budget = [_MAX_UNROLL_TOTAL]
    while i < len(lines):
        line = lines[i]
        if line in ("end",) or _ELSEIF_RE.match(line) or line == "else":
            if depth == 0:
                raise VrlError(f"lua: unexpected {line.split()[0]!r} outside a block")
            return stmts, i
        m = _IF_RE.match(line)
        if m:
            vrl_if, i = _parse_if(lines, i, ev, depth, scope, budget)
            stmts.append(vrl_if)
            continue
        if allow_locals and scope is not None:
            lm = _LOCAL_RE.match(line)
            if lm:
                fields: set = set()
                text = _translate_expr(
                    lm.group("rhs"), ev, scope=scope, fields_out=fields
                )
                scope[lm.group("name")] = {
                    "expr": text, "fields": fields, "tainted": False
                }
                i += 1
                continue
            fm2 = _FOR_RE.match(line)
            if fm2:
                a, b = int(fm2.group("a")), int(fm2.group("b"))
                step = int(fm2.group("s")) if fm2.group("s") else 1
                if step == 0:
                    raise VrlError("lua: 'for' step of 0 never terminates")
                iters = (
                    range(a, b + 1, step) if step > 0
                    else range(a, b - 1, step)
                )
                if len(iters) > _MAX_UNROLL:
                    raise VrlError(
                        f"lua: 'for' loop unrolls to {len(iters)} "
                        f"iterations, past the {_MAX_UNROLL} translate-"
                        "time bound — rewrite as pyscript"
                    )
                body, i = _collect_for_body(lines, i)
                var = fm2.group("var")
                shadow = scope.get(var)
                before_keys = set(scope)
                for v in iters:
                    budget[0] -= 1
                    if budget[0] < 0:
                        raise VrlError(
                            "lua: nested 'for' loops unroll past the "
                            f"{_MAX_UNROLL_TOTAL}-iteration total bound "
                            "— rewrite as pyscript"
                        )
                    scope[var] = {
                        "expr": str(v), "fields": set(), "tainted": False
                    }
                    sub, _ = _parse_block(
                        body, 0, ev, 0, scope, allow_locals=True,
                        budget=budget,
                    )
                    stmts.extend(sub)
                # loop-scoped names go out of scope in Lua: drop them so
                # a use-after-loop raises instead of silently diverging
                for k in set(scope) - before_keys:
                    del scope[k]
                if shadow is not None:
                    scope[var] = shadow
                elif var in scope:
                    del scope[var]
                continue
        if re.match(r"^(?:if|for|while|repeat|local|function)\b", line):
            raise VrlError(
                f"lua: unsupported construct in {line!r} (single-line "
                "if bodies, while/repeat loops, nested functions, and "
                "locals or 'for' loops inside a conditional branch are "
                "not translatable; 'local x = <expr>' and literal-bound "
                "'for i = a, b do' are supported at the top level)"
            )
        fm = field_re.match(line)
        if not fm:
            if allow_locals and scope is not None:
                am = re.match(r"^(?P<name>[A-Za-z_]\w*)\s*=\s*(?P<rhs>.+)$", line)
                if am and am.group("name") in scope and not line.startswith("=="):
                    fields = set()
                    text = _translate_expr(
                        am.group("rhs"), ev, scope=scope, fields_out=fields
                    )
                    scope[am.group("name")] = {
                        "expr": text, "fields": fields, "tainted": False
                    }
                    i += 1
                    continue
            raise VrlError(
                f"lua: unsupported statement {line!r} (translatable "
                "subset: event.log.<field> = <expr>, "
                "event.log.<field> = nil, local x = <expr>, "
                "if/elseif/else blocks, literal 'for' loops, "
                "one final emit)"
            )
        rest = line[fm.end():].lstrip()
        if not rest.startswith("=") or rest.startswith("=="):
            raise VrlError(
                f"lua: unsupported statement {line!r} (expected an "
                "assignment)"
            )
        target_name = fm.group("dot") or fm.group("br")
        target = "." + target_name
        rhs = rest[1:].strip()
        if rhs == "nil":
            stmts.append(f"del({target})")
        else:
            stmts.append(
                f"{target} = {_translate_expr(rhs, ev, scope=scope)}"
            )
        _taint(scope, target_name)
        i += 1
    if depth > 0:
        raise VrlError("lua: if block not closed with 'end'")
    return stmts, i


def _parse_if(
    lines: list[str], i: int, ev: str, depth: int,
    scope: dict | None = None, budget: list | None = None,
) -> tuple[str, int]:
    """Translate an if/elseif/else chain starting at ``lines[i]`` into
    one VRL ``if cond { ... } else if ... else { ... }`` statement;
    returns (statement, index after the chain's ``end``)."""
    parts: list[str] = []
    m = _IF_RE.match(lines[i])
    while True:
        cond = _translate_expr(
            m.group("cond"), ev, conditions=True, scope=scope
        )
        body, i = _parse_block(
            lines, i + 1, ev, depth + 1, scope, budget=budget
        )
        kw = "if" if not parts else "else if"
        parts.append(f"{kw} {cond} {{ {'; '.join(body)} }}")
        line = lines[i]
        m = _ELSEIF_RE.match(line)
        if m:
            continue
        if line == "else":
            body, i = _parse_block(
                lines, i + 1, ev, depth + 1, scope, budget=budget
            )
            parts.append(f"else {{ {'; '.join(body)} }}")
            line = lines[i]
        if line != "end":
            raise VrlError(f"lua: expected 'end' to close if, got {line!r}")
        return " ".join(parts), i + 1


def lua_to_vrl(options: dict) -> str:
    """Translate a verbatim Vector lua v2 transform config to a VRL
    remap source string; VrlError (naming the construct) otherwise."""
    version = str(options.get("version", "2"))
    if version != "2":
        raise VrlError(
            f"lua: only version = \"2\" configs are translatable, "
            f"got {version!r}"
        )
    hooks = options.get("hooks") or {}
    process = hooks.get("process")
    if not process:
        raise VrlError(
            "lua: hooks.process is required (the shim translates the "
            "process hook; init/shutdown hooks are stateful and not "
            "translatable)"
        )
    for extra in sorted(set(hooks) - {"process"}):
        raise VrlError(
            f"lua: hooks.{extra} is stateful and not translatable"
        )
    setup = options.get("source") or ""
    for line in setup.splitlines():
        line = line.split("--", 1)[0].strip()
        if line:
            raise VrlError(
                "lua: global setup `source` is stateful and not "
                f"translatable: {line!r}"
            )
    m = _HOOK_RE.match(process)
    if not m:
        raise VrlError(
            "lua: hooks.process must be a single "
            "'function (event, emit) ... end'"
        )
    ev, emit, body = m.group(1), m.group(2), m.group(3)
    emit_re = re.compile(rf"^{re.escape(emit)}\s*\(\s*{re.escape(ev)}\s*\)$")
    # strip comments/blank lines up front so block parsing sees only
    # real statements; the final emit is validated here (it is the 1:1
    # remap implicit) and must be top-level and last
    lines = []
    for raw in body.splitlines():
        line = raw.split("--", 1)[0].strip()
        if line:
            lines.append(line)
    if not lines or not emit_re.match(lines[-1]):
        raise VrlError(
            "lua: hooks.process must end with exactly one "
            f"emit({ev}) (conditional emit / drop is not translatable "
            "— use filter or route)"
        )
    for line in lines[:-1]:
        if emit_re.match(line):
            raise VrlError(
                f"lua: emit({ev}) may only appear once, as the final "
                "statement (conditional emit is not translatable)"
            )
    stmts, _ = _parse_block(lines[:-1], 0, ev, 0, scope={}, allow_locals=True)
    return "\n".join(stmts)
