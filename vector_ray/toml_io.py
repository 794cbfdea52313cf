"""TOML serialization for pipeline specs — the reference's config format
(PipelineConfig ⇄ Vector TOML, shared/src/config.rs:48-55; round-trip
test config.rs:404-424).

Reading uses stdlib ``tomllib``; writing uses a minimal emitter (no
tomli_w in this environment) covering the spec shape: nested tables for
``[sources.<id>]`` / ``[transforms.<id>]`` / ``[sinks.<id>]``, scalar
options, lists, and one level of inline sub-tables (e.g. route maps).
"""

from __future__ import annotations

import tomllib

from vector_ray.pipeline import PipelineSpec


def loads(text: str) -> PipelineSpec:
    return PipelineSpec.from_dict(tomllib.loads(text))


def load(path: str) -> PipelineSpec:
    with open(path, "rb") as f:
        return PipelineSpec.from_dict(tomllib.load(f))


def _fmt_value(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        escaped = v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
        return f'"{escaped}"'
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_fmt_value(x) for x in v) + "]"
    if isinstance(v, dict):
        inner = ", ".join(f"{_fmt_key(k)} = {_fmt_value(x)}" for k, x in v.items())
        return "{" + inner + "}"
    raise TypeError(f"cannot serialize {type(v).__name__} to TOML: {v!r}")


def _fmt_key(k: str) -> str:
    if k.replace("_", "").replace("-", "").isalnum():
        return k
    return _fmt_value(k)


def dumps(spec: PipelineSpec | dict) -> str:
    d = spec.to_dict() if isinstance(spec, PipelineSpec) else spec
    lines: list[str] = []
    for section in ("sources", "transforms", "sinks"):
        for name, cfg in (d.get(section) or {}).items():
            lines.append(f"[{section}.{_fmt_key(name)}]")
            for key, value in cfg.items():
                lines.append(f"{_fmt_key(key)} = {_fmt_value(value)}")
            lines.append("")
    return "\n".join(lines)


def dump(spec: PipelineSpec | dict, path: str) -> None:
    with open(path, "w") as f:
        f.write(dumps(spec))
