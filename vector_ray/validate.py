"""Pipeline-spec validation — the analog of the reference's config
validator (vectorize-cli/src/validation/mod.rs).

Error codes mirror the reference's:

* ``MISSING_TYPE``   — component has no ``type`` (validation/mod.rs:277)
* ``INVALID_INPUT``  — ``inputs`` names a non-existent component
  (validation/mod.rs:254-327); referencing a *sink* as an input is also
  invalid (sinks are terminal).
* ``UNKNOWN_TYPE``   — type not in the stage registry (our registry is
  the analog of the palette, ui palette.rs:70-214).

Warnings (validation/mod.rs:196-211, 268-273):

* ``NO_SOURCES`` / ``NO_SINKS`` — pipeline has none
* ``MISSING_INPUTS`` — transform/sink with an empty ``inputs`` list
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Issue:
    severity: str  # "error" | "warning"
    code: str
    message: str
    component: str | None = None

    def __str__(self) -> str:  # pragma: no cover
        where = f" [{self.component}]" if self.component else ""
        return f"{self.severity.upper()} {self.code}{where}: {self.message}"


@dataclass
class ValidationResult:
    issues: list[Issue] = field(default_factory=list)

    @property
    def errors(self) -> list[Issue]:
        return [i for i in self.issues if i.severity == "error"]

    @property
    def warnings(self) -> list[Issue]:
        return [i for i in self.issues if i.severity == "warning"]

    @property
    def ok(self) -> bool:
        return not self.errors

    def codes(self) -> set[str]:
        return {i.code for i in self.issues}


class ValidationError(ValueError):
    def __init__(self, result: ValidationResult):
        self.result = result
        super().__init__(
            "; ".join(str(i) for i in result.errors) or "invalid pipeline"
        )


def _strip_port(ref: str) -> str:
    """'router.errors' → 'router' (named route output, config.rs:224-231)."""
    return ref.split(".", 1)[0]


def validate_spec(spec: dict, known_types: set[str] | None = None) -> ValidationResult:
    res = ValidationResult()
    sources = spec.get("sources") or {}
    transforms = spec.get("transforms") or {}
    sinks = spec.get("sinks") or {}

    if not sources:
        res.issues.append(Issue("warning", "NO_SOURCES", "pipeline has no sources"))
    if not sinks:
        res.issues.append(Issue("warning", "NO_SINKS", "pipeline has no sinks"))

    valid_inputs = set(sources) | set(transforms)

    for section, comps, needs_inputs in (
        ("sources", sources, False),
        ("transforms", transforms, True),
        ("sinks", sinks, True),
    ):
        for name, cfg in comps.items():
            if not isinstance(cfg, dict) or not cfg.get("type"):
                res.issues.append(
                    Issue("error", "MISSING_TYPE",
                          f"{section[:-1]} '{name}' has no type", name)
                )
                continue
            if known_types is not None and cfg["type"] not in known_types:
                res.issues.append(
                    Issue("error", "UNKNOWN_TYPE",
                          f"{section[:-1]} '{name}' has unknown type "
                          f"'{cfg['type']}'", name)
                )
            if needs_inputs:
                inputs = cfg.get("inputs") or []
                if not inputs:
                    res.issues.append(
                        Issue("warning", "MISSING_INPUTS",
                              f"{section[:-1]} '{name}' has no inputs", name)
                    )
                # two-input transforms (join) name their right side via
                # the ``right`` option — same referential rules
                extra = (
                    [str(cfg["right"])]
                    if section == "transforms" and cfg.get("right")
                    else []
                )
                for ref in list(inputs) + extra:
                    if _strip_port(ref) not in valid_inputs:
                        res.issues.append(
                            Issue("error", "INVALID_INPUT",
                                  f"{section[:-1]} '{name}' references "
                                  f"non-existent input '{ref}'", name)
                        )
    return res
