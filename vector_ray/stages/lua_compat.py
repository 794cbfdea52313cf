"""Vector ``lua`` transform compatibility shim (reference palette:
ui/src/components/pipeline/palette.rs:128 models the transform; Vector's
public lua v2 docs define the config surface: ``version``, ``source``
global setup, ``hooks.process = "function (event, emit) ... end"``).

This engine has no Lua VM. Instead, the TRIVIALLY MAPPABLE statement
subset of a verbatim Vector lua v2 config is translated to the engine's
vectorized VRL remap program:

    event.log.<field> = <expr>      ->  .<field> = <expr'>
    event.log.<field> = nil         ->  del(.<field>)
    emit(event)  (exactly once, last)  -> (implicit: remap emits 1:1)

where <expr'> maps ``event.log.x`` -> ``.x``, Lua's ``..`` concat ->
VRL ``+``, and passes through numeric/string literals, ``+ - * / %``
and parentheses. Anything outside that subset — control flow, local
variables, library calls, stateful global setup, conditional emit /
drop — raises ``VrlError`` naming the construct, so a user porting a
real lua block sees exactly which line needs a rewrite (to filter /
route / pyscript) instead of silently wrong output.
"""

from __future__ import annotations

import re

from vector_ray.vrl import VrlError

_HOOK_RE = re.compile(
    r"^\s*function\s*\(\s*([A-Za-z_]\w*)\s*,\s*([A-Za-z_]\w*)\s*\)"
    r"(.*?)\bend\s*$",
    re.S,
)


def _field_pattern(ev: str) -> re.Pattern:
    return re.compile(
        rf"{re.escape(ev)}\.log(?:\.(?P<dot>[A-Za-z_]\w*)"
        rf"|\[\s*(?P<q>[\"'])(?P<br>[A-Za-z_]\w*)(?P=q)\s*\])"
    )


def _translate_expr(expr: str, ev: str) -> str:
    field_re = _field_pattern(ev)
    tok_re = re.compile(
        r"\s*(?:(?P<concat>\.\.)|(?P<op>[-+*/%()])"
        r"|(?P<num>\d+(?:\.\d+)?)"
        r"|(?P<dq>\"[^\"]*\")|(?P<sq>'[^']*'))"
    )
    out: list[str] = []
    pos = 0
    n = len(expr)
    while pos < n:
        if expr[pos].isspace():
            pos += 1
            continue
        m = field_re.match(expr, pos)
        if m:
            out.append("." + (m.group("dot") or m.group("br")))
            pos = m.end()
            continue
        m = tok_re.match(expr, pos)
        if m and m.end() > pos:
            if m.group("concat"):
                out.append("+")
            elif m.group("op"):
                out.append(m.group("op"))
            elif m.group("num"):
                out.append(m.group("num"))
            elif m.group("dq"):
                out.append(m.group("dq"))
            else:  # single-quoted lua string -> double-quoted VRL
                inner = m.group("sq")[1:-1]
                if '"' in inner:
                    raise VrlError(
                        "lua: embedded double quote in single-quoted "
                        f"string literal {m.group('sq')!r} is not "
                        "translatable"
                    )
                out.append(f'"{inner}"')
            pos = m.end()
            continue
        bad = expr[pos:].split()[0]
        raise VrlError(
            f"lua: unsupported construct {bad!r} in expression "
            f"{expr.strip()!r} (translatable subset: event.log fields, "
            "numeric/string literals, + - * / % .. and parentheses)"
        )
    if not out:
        raise VrlError(f"lua: empty expression in {expr!r}")
    return " ".join(out)


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
    field_re = _field_pattern(ev)
    emit_re = re.compile(rf"^{re.escape(emit)}\s*\(\s*{re.escape(ev)}\s*\)$")
    stmts: list[str] = []
    emitted = False
    for raw in body.splitlines():
        line = raw.split("--", 1)[0].strip()
        if not line:
            continue
        if emitted:
            raise VrlError(
                f"lua: statement after emit({ev}) is not supported: "
                f"{line!r}"
            )
        if emit_re.match(line):
            emitted = True
            continue
        fm = field_re.match(line)
        if not fm:
            raise VrlError(
                f"lua: unsupported statement {line!r} (translatable "
                "subset: event.log.<field> = <expr>, "
                "event.log.<field> = nil, one final emit)"
            )
        rest = line[fm.end():].lstrip()
        if not rest.startswith("="):
            raise VrlError(
                f"lua: unsupported statement {line!r} (expected "
                "an assignment)"
            )
        target = "." + (fm.group("dot") or fm.group("br"))
        rhs = rest[1:].strip()
        if rhs == "nil":
            stmts.append(f"del({target})")
        else:
            stmts.append(f"{target} = {_translate_expr(rhs, ev)}")
    if not emitted:
        raise VrlError(
            "lua: hooks.process must end with exactly one "
            f"emit({ev}) (conditional emit / drop is not translatable "
            "— use filter or route)"
        )
    return "\n".join(stmts)
