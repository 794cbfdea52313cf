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
    assert src.splitlines() == [
        ".y = .x * 2 + 1",
        '.t = .name + "-z"',
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
     "unsupported statement"),
    ("function (event, emit)\n  event.log.y = os.time()\n  emit(event)\nend",
     "unsupported construct"),
    ("function (event, emit)\n  event.log.y = 1\nend", "emit"),
    ("function (event, emit)\n  emit(event)\n  event.log.y = 1\nend",
     "after emit"),
])
def test_untranslatable_constructs_raise(process, needle):
    with pytest.raises(VrlError, match=needle):
        lua_to_vrl(_cfg(process))


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
