"""Tests for grok pattern expansion (vector_ray/grok.py) and the
parse_grok remap op."""

from __future__ import annotations

import re

import pyarrow as pa
import pytest

import ray.data as rd

from vector_ray.grok import GROK_PATTERNS, grok_to_regex
from vector_ray.vrl import VrlError


def test_expansion_named_and_typed():
    regex, types = grok_to_regex(
        r"%{IPV4:ip} %{WORD:verb} status=%{POSINT:code:int}"
    )
    assert types == {"code": "int"}
    m = re.match(regex, "10.1.2.3 GET status=200")
    assert m.groupdict() == {"ip": "10.1.2.3", "verb": "GET", "code": "200"}


def test_anonymous_and_unknown():
    regex, types = grok_to_regex(r"%{INT} then %{WORD:w}")
    assert types == {}
    assert re.match(regex, "42 then go").group("w") == "go"
    with pytest.raises(VrlError):
        grok_to_regex(r"%{NOPE:x}")
    with pytest.raises(VrlError):
        grok_to_regex(r"%{WORD:a} %{INT:a}")  # duplicate field
    with pytest.raises(VrlError):
        grok_to_regex(r"%{POSINT:2xx}")  # digit-leading field name


def test_all_patterns_are_re2_safe():
    # every library pattern must compile standalone and via pyarrow's RE2
    import pyarrow.compute as pc

    for name, body in GROK_PATTERNS.items():
        re.compile(body)
        regex, _ = grok_to_regex("%{" + name + ":x}")
        pc.extract_regex(pa.array(["probe"]), pattern=regex)  # RE2 accepts


def test_parse_grok_op(ray_session):
    from vector_ray.stages import core

    msgs = [
        "host-1 app[42]: level=error status=500 latency_ms=12 doc=doc-1",
        "h.example app2[7]: level=info status=200 latency_ms=3 doc=doc-2",
    ]
    ds = rd.from_arrow(pa.table({"message": pa.array(msgs)}))
    out = core.remap(
        ds,
        {
            "ops": [
                {
                    "op": "parse_grok",
                    "field": "message",
                    "pattern": (
                        r"^%{HOSTNAME:host} %{WORD:app}\[%{POSINT:pid:int}\]: "
                        r"level=%{WORD:level} status=%{POSINT:status:int} "
                        r"latency_ms=%{POSINT:latency_ms:int} doc=%{NOTSPACE:doc}"
                    ),
                }
            ]
        },
    ).to_pandas()
    assert out.host.tolist() == ["host-1", "h.example"]
    assert out.pid.tolist() == [42, 7]
    assert out.status.tolist() == [500, 200]
    assert out.level.tolist() == ["error", "info"]
    assert out.doc.tolist() == ["doc-1", "doc-2"]
