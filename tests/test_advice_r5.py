"""Round-5 ADVICE fixes: quote/comment-aware remap statement splitting,
ngram_novelty negative-id validation, metrics readiness restricted to
sink-reachable transforms, and uniform mask shape for null-literal
comparisons.
"""

from __future__ import annotations

import time

import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# A (medium): _split_statements / _match_brace quote + comment awareness
# ---------------------------------------------------------------------------


def test_split_statements_brace_in_string():
    from vector_ray.stages.core import _split_statements

    assert _split_statements('.x = "{"') == ['.x = "{"']
    assert _split_statements(".x = '}'") == [".x = '}'"]
    # ; and newline inside a literal don't split
    assert _split_statements('.x = "a;b\nc"') == ['.x = "a;b\nc"']
    # escaped quote keeps the literal open across a would-be terminator
    assert _split_statements('.x = "a\\";{"; .y = 2') == [
        '.x = "a\\";{"',
        ".y = 2",
    ]


def test_split_statements_comments_stripped():
    from vector_ray.stages.core import _split_statements

    src = ".x = 1 # trailing { comment; with separators\n.y = 2"
    assert _split_statements(src) == [".x = 1", ".y = 2"]
    assert _split_statements("# only a comment {;}\n.z = 3") == [".z = 3"]
    # a # inside a string is text, not a comment
    assert _split_statements('.x = "#not a comment"') == [
        '.x = "#not a comment"'
    ]


def test_split_statements_still_rejects_unbalanced():
    from vector_ray.stages.core import _split_statements
    from vector_ray.vrl import VrlError

    with pytest.raises(VrlError, match="unbalanced"):
        _split_statements("if .x == 1 { .y = 2")
    with pytest.raises(VrlError, match="unterminated"):
        _split_statements('.x = "oops')


def test_remap_brace_string_end_to_end(ray_session):
    import ray.data as rd

    from vector_ray.stages.core import remap

    ds = rd.from_items([{"a": 1}, {"a": 2}])
    out = remap(ds, {"source": '.brace = "{" # set it\n.b = .a'})
    rows = sorted(out.take_all(), key=lambda r: r["a"])
    assert [r["brace"] for r in rows] == ["{", "{"]
    assert [r["b"] for r in rows] == [1, 2]


def test_if_condition_with_brace_string(ray_session):
    import ray.data as rd

    from vector_ray.stages.core import remap

    ds = rd.from_items([{"lvl": "{"}, {"lvl": "ok"}])
    out = remap(
        ds,
        {"source": 'if .lvl == "{" { .tag = "brace" } else { .tag = "plain" }'},
    )
    got = {r["lvl"]: r["tag"] for r in out.take_all()}
    assert got == {"{": "brace", "ok": "plain"}


def test_lua_shim_single_quote_brace(ray_session):
    """The ADVICE repro: the Lua shim emits a VRL assignment of a
    single-quoted brace string; the splitter must not count it."""
    import ray.data as rd

    from vector_ray.stages import TRANSFORMS

    ds = rd.from_items([{"msg": "m"}])
    out = TRANSFORMS["lua"](
        ds,
        {
            "type": "lua",
            "version": "2",
            "hooks": {
                "process": "function (event, emit)\n"
                "  event.log.x = '{'\n"
                "  emit(event)\n"
                "end"
            },
        },
    )
    assert out.take_all()[0]["x"] == "{"


# ---------------------------------------------------------------------------
# B (low): ngram_novelty rejects user-supplied negative doc ids
# ---------------------------------------------------------------------------


def test_ngram_novelty_negative_id_raises(ray_session):
    import ray.data as rd

    from vector_ray.functions.tokens import ngram_novelty

    ds = rd.from_arrow(
        pa.table(
            {
                "did": pa.array([-5, 1], pa.int64()),
                "tokens": pa.array([[1, 2, 3], [1, 2, 3]], pa.list_(pa.int32())),
            }
        )
    )
    with pytest.raises(Exception, match="must be >= 0"):
        ngram_novelty(ds, n=2).materialize()


# ---------------------------------------------------------------------------
# C (low): metrics readiness wait only covers sink-reachable transforms
# ---------------------------------------------------------------------------


def test_metrics_wait_skips_dangling_transform(ray_session):
    from vector_ray import run_pipeline
    from vector_ray.pipeline import PipelineContext
    from vector_ray.state.metrics import MetricsHub

    rows = [{"kind": "click"}, {"kind": "view"}]
    spec = {
        "sources": {"in": {"type": "inline", "rows": rows}},
        "transforms": {
            "f": {
                "type": "filter",
                "inputs": ["in"],
                "condition": '.kind == "click"',
            },
            # never consumed by any sink: its batch fn never runs, so it
            # never reports — the readiness wait must not hold the
            # deadline open for it
            "dangling": {
                "type": "filter",
                "inputs": ["in"],
                "condition": '.kind == "view"',
            },
        },
        "sinks": {"out": {"type": "collect", "inputs": ["f"]}},
    }
    hub = MetricsHub.remote()
    t0 = time.monotonic()
    res = run_pipeline(spec, PipelineContext(metrics=hub))
    elapsed = time.monotonic() - t0
    assert res.metrics["f"]["rows"] == 1
    assert "dangling" not in res.metrics
    # the un-fixed wait burns the full 3 s readiness deadline; the whole
    # tiny run should finish well under it
    assert elapsed < 2.9, f"metrics readiness stalled: {elapsed:.2f}s"


# ---------------------------------------------------------------------------
# D (low): null-vs-scalar comparisons return per-row masks
# ---------------------------------------------------------------------------


def test_null_scalar_comparison_mask_shape():
    from vector_ray.vrl import compile_expr

    t = pa.table({"x": [1, 2, 3]})
    for src, expect in [
        ("5 == null", False),
        ("5 != null", True),
        ("null == null", True),
        ("null != null", False),
        ('"s" == null', False),
    ]:
        m = compile_expr(src)(t)
        # a mask Table.filter accepts, not a plain bool
        assert hasattr(m, "type"), f"{src} returned {type(m)}"
        assert m.to_pylist() == [expect] * 3, src
        assert t.filter(m).num_rows == (3 if expect else 0)
