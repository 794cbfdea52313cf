"""Grok pattern expansion: ``%{PATTERN:field:type}`` → a named-group
regex consumed by the vectorized ``parse_regex`` machinery
(``pc.extract_regex`` / RE2 over the whole column).

Vector's remap/parse transforms accept grok expressions
(VRL ``parse_grok``, upstream pattern library); this implements the
standard core patterns from the public grok pattern set. Expansion is
recursive (patterns reference other patterns), then the whole pattern
compiles ONCE per stage — per batch it is a single ``extract_regex``
kernel call, never a per-row loop.
"""

from __future__ import annotations

import re

from vector_ray.vrl import VrlError

# The commonly-used core of the public grok pattern library. Kept to
# RE2-compatible constructs (no backrefs, no lookaround) so
# pc.extract_regex can run them.
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)",
    "POSINT": r"\d+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"[a-zA-Z0-9._-]+",
    "IPV4": r"(?:\d{1,3}\.){3}\d{1,3}",
    "IP": r"(?:\d{1,3}\.){3}\d{1,3}",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\b",
    "HOST": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\b",
    "QUOTEDSTRING": r'"[^"]*"',
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    "LOGLEVEL": r"(?:[Tt]race|[Dd]ebug|[Ii]nfo|[Nn]otice|[Ww]arn(?:ing)?|[Ee]rr(?:or)?|[Cc]rit(?:ical)?|[Ff]atal|[Ss]evere)",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "SYSLOGTIMESTAMP": r"\w{3} +\d+ \d{2}:\d{2}:\d{2}",
    "HTTPDATE": r"\d{2}/\w{3}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}",
}

# field must be a valid regex group name (no leading digit) — a
# digit-leading field would emit (?P<1x>...) and surface as a raw
# re.error instead of the VrlError contract
_GROK_REF = re.compile(
    r"%\{(?P<name>[A-Z0-9_]+)(?::(?P<field>[A-Za-z_][A-Za-z0-9_]*))?(?::(?P<type>int|float))?\}"
)

_MAX_DEPTH = 10


def grok_to_regex(pattern: str) -> tuple[str, dict[str, str]]:
    """Expand a grok expression into (RE2 named-group regex, field→type).

    ``%{NAME}`` expands anonymously; ``%{NAME:field}`` becomes a named
    capture group ``(?P<field>…)``; ``%{NAME:field:int|float}`` also
    records the cast for the parse stage. Unknown pattern names raise
    ``VrlError`` (the remap stage surfaces it at compile time).
    """
    types: dict[str, str] = {}

    def sub_one(m: re.Match) -> str:
        name = m.group("name")
        if name not in GROK_PATTERNS:
            raise VrlError(f"unknown grok pattern %{{{name}}}")
        body = GROK_PATTERNS[name]
        field = m.group("field")
        if field:
            if field in types:
                raise VrlError(f"duplicate grok field {field!r}")
            if m.group("type"):
                types[field] = m.group("type")
            else:
                types.setdefault(field, "string")
            return f"(?P<{field}>{body})"
        return f"(?:{body})"

    out = pattern
    for _ in range(_MAX_DEPTH):
        new = _GROK_REF.sub(sub_one, out)
        if new == out:
            break
        out = new
    else:
        raise VrlError("grok pattern nesting exceeds max depth")
    if "%{" in out:
        # catches both unexpandable nesting AND malformed refs that the
        # ref regex refuses (e.g. a digit-leading field name)
        raise VrlError(
            f"grok pattern contains an invalid or unexpandable reference: "
            f"{out[out.index('%{'):][:40]!r}"
        )
    return out, {f: t for f, t in types.items() if t != "string"}
