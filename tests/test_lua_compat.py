"""Vector lua-v2 compatibility shim (stages/lua_compat.py): the
trivially mappable hook subset translates to VRL; everything else must
raise VrlError naming the construct."""

import pyarrow as pa
import pytest

from vector_ray.stages.lua_compat import lua_to_vrl
from vector_ray.vrl import VrlError


def _cfg(process, **kw):
    return {"type": "lua", "version": "2",
            "hooks": {"process": process}, **kw}


HOOK = (
    "function (event, emit)\n"
    "  event.log.y = event.log.x * 2 + 1\n"
    "  event.log.t = event.log.name .. '-z'\n"
    "  event.log.gone = nil\n"
    "  emit(event)\n"
    "end"
)


def test_translates_mappable_subset():
    src = lua_to_vrl(_cfg(HOOK))
    # '..' operands are string()-wrapped: Lua coerces concat operands
    # to string, so numeric FIELDS must concatenate ("12"), not add
    assert src.splitlines() == [
        ".y = .x * 2 + 1",
        '.t = string(.name) + "-z"',
        "del(.gone)",
    ]


def test_bracket_field_and_comments():
    src = lua_to_vrl(_cfg(
        "function (ev, out)\n"
        "  -- a comment line\n"
        '  ev.log["a"] = ev.log["b"]  -- trailing comment\n'
        "  out(ev)\n"
        "end"
    ))
    assert src == ".a = .b"


def test_end_to_end_remap(ray_session):
    import ray.data as rd

    from vector_ray.stages import TRANSFORMS

    ds = rd.from_arrow(pa.table({"x": [1.0, 2.0], "name": ["a", "b"],
                                 "gone": [9, 9]}))
    out = TRANSFORMS["lua"](ds, _cfg(HOOK)).to_pandas()
    assert out["y"].tolist() == [3.0, 5.0]
    assert out["t"].tolist() == ["a-z", "b-z"]
    assert "gone" not in out.columns


@pytest.mark.parametrize("process,needle", [
    ("function (event, emit)\n  if x then end\n  emit(event)\nend",
     "unsupported construct"),
    ("function (event, emit)\n  event.log.y = os.time()\n  emit(event)\nend",
     "unsupported construct"),
    ("function (event, emit)\n  event.log.y = 1\nend", "emit"),
    ("function (event, emit)\n  emit(event)\n  event.log.y = 1\nend",
     "must end with exactly one"),
    # conditional emit (emit inside an if branch) is not translatable
    ("function (event, emit)\n  if event.log.x > 1 then\n    emit(event)\n"
     "  end\nend", "emit"),
    # non-literal loop bounds / while loops raise by name (literal
    # bounded 'for' and straight-line locals translate since round 5)
    ("function (event, emit)\n  for i = 1, event.log.n do\n  end\n"
     "  emit(event)\nend", "unsupported construct"),
    ("function (event, emit)\n  while true do\n  end\n  emit(event)\nend",
     "unsupported construct"),
    # '..' with a numeric literal operand would coerce in Lua
    ("function (event, emit)\n  event.log.y = event.log.x .. 1\n"
     "  emit(event)\nend", "numeric operand"),
    # mixed '..'/arithmetic without parens is ambiguous across languages
    ("function (event, emit)\n  event.log.y = event.log.a .. event.log.b"
     " + 1\n  emit(event)\nend", "parenthes"),
])
def test_untranslatable_constructs_raise(process, needle):
    with pytest.raises(VrlError, match=needle):
        lua_to_vrl(_cfg(process))


COND_HOOK = (
    "function (event, emit)\n"
    "  if event.log.v >= 100 then\n"
    "    event.log.band = 'high'\n"
    "    event.log.flag = 1\n"
    "  elseif event.log.v >= 10 then\n"
    "    event.log.band = 'mid'\n"
    "  else\n"
    "    event.log.band = 'low'\n"
    "    event.log.flag = 0\n"
    "  end\n"
    "  emit(event)\n"
    "end"
)


def test_translates_conditionals():
    src = lua_to_vrl(_cfg(COND_HOOK))
    assert src == (
        'if .v >= 100 { .band = "high"; .flag = 1 } '
        'else if .v >= 10 { .band = "mid" } '
        'else { .band = "low"; .flag = 0 }'
    )


def test_conditional_end_to_end(ray_session):
    import ray.data as rd

    from vector_ray.stages import TRANSFORMS

    ds = rd.from_arrow(
        pa.table({"v": [5.0, 50.0, 500.0, None]})
    )
    out = TRANSFORMS["lua"](ds, _cfg(COND_HOOK)).to_pandas()
    by_v = dict(zip(out["v"], zip(out["band"], out["flag"])))
    assert by_v[5.0] == ("low", 0)
    assert by_v[50.0][0] == "mid" and pa.compute.is_null(
        pa.scalar(by_v[50.0][1])
    ).as_py() in (True,) or by_v[50.0][1] != by_v[50.0][1]  # NaN/null
    assert by_v[500.0] == ("high", 1)


def test_nested_conditionals_translate_and_run(ray_session):
    import ray.data as rd

    from vector_ray.stages import TRANSFORMS

    hook = (
        "function (e, emit)\n"
        "  if e.log.kind == 'a' and e.log.v > 0 then\n"
        "    if e.log.v > 10 then\n"
        "      e.log.tag = 'big-a'\n"
        "    else\n"
        "      e.log.tag = 'small-a'\n"
        "    end\n"
        "  else\n"
        "    e.log.tag = 'other'\n"
        "  end\n"
        "  emit(e)\n"
        "end"
    )
    ds = rd.from_arrow(
        pa.table({"kind": ["a", "a", "b"], "v": [5, 50, 50]})
    )
    out = TRANSFORMS["lua"](ds, _cfg(hook)).to_pandas()
    assert out["tag"].tolist() == ["small-a", "big-a", "other"]


def test_stateful_setup_raises():
    with pytest.raises(VrlError, match="stateful"):
        lua_to_vrl(_cfg("function (event, emit)\n  emit(event)\nend",
                        source="count = 0"))
    # comment-only setup is fine
    lua_to_vrl(_cfg("function (event, emit)\n  emit(event)\nend",
                    source="-- just a comment\n"))


def test_other_hooks_and_versions_raise():
    with pytest.raises(VrlError, match="init"):
        lua_to_vrl({"version": "2",
                    "hooks": {"process": "function (e, m)\n  m(e)\nend",
                              "init": "function () end"}})
    with pytest.raises(VrlError, match="version"):
        lua_to_vrl(_cfg("function (e, m)\n  m(e)\nend") | {"version": "1"})


@pytest.mark.parametrize("rhs,vrl", [
    ("string.upper(e.log.name)", ".x = upcase ( .name )"),
    ("string.lower(e.log.name) .. '-z'", '.x = downcase ( .name ) + "-z"'),
    ("string.len(e.log.name) * 2", ".x = length ( .name ) * 2"),
    ("tostring(e.log.v) .. 'u'", '.x = string ( .v ) + "u"'),
    ("tonumber(e.log.s) + 1", ".x = to_float ( .s ) + 1"),
    # Lua 1-based inclusive -> VRL 0-based exclusive
    ("string.sub(e.log.name, 1, 3)", ".x = slice(.name, 0, 3)"),
])
def test_string_library_mappings(rhs, vrl):
    src = lua_to_vrl(_cfg(
        f"function (e, emit)\n  e.log.x = {rhs}\n  emit(e)\nend"))
    assert src == vrl


@pytest.mark.parametrize("rhs,needle", [
    # negative (from-end) indices have no literal slice spelling
    ("string.sub(e.log.name, -2, 3)", "string.sub"),
    # unsupported library call raises by name
    ("string.rep(e.log.name, 2)", "unsupported construct"),
    # number-returning call concatenated -> would coerce in Lua
    ("tonumber(e.log.s) .. 'x'", "parenthesized"),
])
def test_string_library_untranslatable(rhs, needle):
    with pytest.raises(VrlError, match=needle):
        lua_to_vrl(_cfg(
            f"function (e, emit)\n  e.log.x = {rhs}\n  emit(e)\nend"))


def test_string_library_end_to_end(ray_session):
    import ray.data as rd

    from vector_ray.stages import TRANSFORMS

    hook = (
        "function (e, emit)\n"
        "  e.log.tag = string.upper(string.sub(e.log.name, 1, 3))"
        " .. '-' .. tostring(e.log.v)\n"
        "  emit(e)\n"
        "end"
    )
    ds = rd.from_arrow(pa.table({"name": ["Hello", "WorldWide"],
                                 "v": [1, 2]}))
    out = TRANSFORMS["lua"](ds, _cfg(hook)).to_pandas()
    assert out["tag"].tolist() == ["HEL-1", "WOR-2"]


# ---------------------------------------------------------------------------
# round-5: straight-line locals + literal-bounded for loops
# ---------------------------------------------------------------------------


def test_locals_substitute_straight_line():
    src = lua_to_vrl(_cfg(
        "function (event, emit)\n"
        "  local base = event.log.value * 2\n"
        "  event.log.scaled = base + 1\n"
        "  emit(event)\nend"
    ))
    assert src == ".scaled = (.value * 2) + 1"


def test_local_in_condition_and_branch_body():
    src = lua_to_vrl(_cfg(
        "function (event, emit)\n"
        "  local lim = 50\n"
        "  if event.log.value > lim then\n"
        "    event.log.over = event.log.value - lim\n"
        "  end\n"
        "  emit(event)\nend"
    ))
    assert src == "if .value > (50) { .over = .value - (50) }"


def test_for_loop_unrolls_with_accumulator():
    src = lua_to_vrl(_cfg(
        "function (event, emit)\n"
        "  local s = 0\n"
        "  for i = 1, 3 do\n"
        "    s = s + i\n"
        "  end\n"
        "  event.log.total = s\n"
        "  emit(event)\nend"
    ))
    assert src == ".total = ((((0) + (1)) + (2)) + (3))"


def test_for_loop_step_and_field_write():
    src = lua_to_vrl(_cfg(
        "function (event, emit)\n"
        "  for i = 4, 0, -2 do\n"
        "    event.log.last = i\n"
        "  end\n"
        "  emit(event)\nend"
    ))
    assert src == ".last = (4)\n.last = (2)\n.last = (0)"


def test_tainted_local_raises():
    with pytest.raises(VrlError, match="reassigned after"):
        lua_to_vrl(_cfg(
            "function (event, emit)\n"
            "  local old = event.log.value\n"
            "  event.log.value = 0\n"
            "  event.log.y = old\n"
            "  emit(event)\nend"
        ))


def test_taint_applies_from_branch_assignment():
    # the field reassignment happens in a conditional arm: Lua may or
    # may not overwrite; substitution must refuse conservatively
    with pytest.raises(VrlError, match="reassigned after"):
        lua_to_vrl(_cfg(
            "function (event, emit)\n"
            "  local old = event.log.value\n"
            "  if event.log.value > 1 then\n"
            "    event.log.value = 0\n"
            "  end\n"
            "  event.log.y = old\n"
            "  emit(event)\nend"
        ))


def test_untainted_local_use_before_reassign_ok():
    src = lua_to_vrl(_cfg(
        "function (event, emit)\n"
        "  local old = event.log.value\n"
        "  event.log.y = old\n"
        "  event.log.value = 0\n"
        "  emit(event)\nend"
    ))
    assert src == ".y = (.value)\n.value = 0"


def test_loop_bounds_enforced():
    with pytest.raises(VrlError, match="64"):
        lua_to_vrl(_cfg(
            "function (event, emit)\n  for i = 1, 100 do\n"
            "    event.log.x = i\n  end\n  emit(event)\nend"
        ))
    # nested loops trip the total budget
    with pytest.raises(VrlError, match="total bound"):
        lua_to_vrl(_cfg(
            "function (event, emit)\n"
            "  for i = 1, 60 do\n"
            "    for j = 1, 60 do\n"
            "      event.log.x = i + j\n"
            "    end\n"
            "  end\n  emit(event)\nend"
        ))
    with pytest.raises(VrlError, match="step"):
        lua_to_vrl(_cfg(
            "function (event, emit)\n  for i = 1, 3, 0 do\n"
            "    event.log.x = i\n  end\n  emit(event)\nend"
        ))


def test_loop_var_out_of_scope_after_loop():
    with pytest.raises(VrlError, match="unsupported construct 'i'"):
        lua_to_vrl(_cfg(
            "function (event, emit)\n  for i = 1, 2 do\n"
            "    event.log.x = i\n  end\n  event.log.y = i\n"
            "  emit(event)\nend"
        ))


def test_local_and_loop_in_branch_raise():
    with pytest.raises(VrlError, match="unsupported construct"):
        lua_to_vrl(_cfg(
            "function (event, emit)\n  if event.log.v > 1 then\n"
            "    local z = 1\n  end\n  emit(event)\nend"
        ))
    with pytest.raises(VrlError, match="unsupported construct"):
        lua_to_vrl(_cfg(
            "function (event, emit)\n  if event.log.v > 1 then\n"
            "    for i = 1, 2 do\n    end\n  end\n  emit(event)\nend"
        ))


def test_concat_on_local_raises():
    with pytest.raises(VrlError, match="local variable"):
        lua_to_vrl(_cfg(
            "function (event, emit)\n  local v = event.log.value\n"
            "  event.log.t = v .. 'x'\n  emit(event)\nend"
        ))


def test_loop_locals_end_to_end(ray_session):
    import ray.data as rd

    from vector_ray.stages import TRANSFORMS

    ds = rd.from_arrow(pa.table({"value": [1.0, 10.0]}))
    out = TRANSFORMS["lua"](ds, _cfg(
        "function (event, emit)\n"
        "  local s = 0\n"
        "  for i = 1, 4 do\n"
        "    s = s + i * i\n"
        "  end\n"
        "  event.log.powsum = s\n"
        "  event.log.scaled = event.log.value * s\n"
        "  emit(event)\nend"
    )).to_pandas().sort_values("value")
    assert out["powsum"].tolist() == [30.0, 30.0]
    assert out["scaled"].tolist() == [30.0, 300.0]
